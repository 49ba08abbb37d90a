"""MLBW warp + learned inpainting of disocclusion holes.

Behavioral parity target: reference iw3/mlbw_inpaint.py —
  * hole masks predicted by a mask-MLBW net (MLBW with hole_mask=True),
    thresholded at MASK_MLBW_THRESHOLD=0.15 (:18-34)
  * per-eye inpainting; the left eye runs flipped so one right-view
    inpaint model serves both (:21-34)
  * MLBWInpaintImage single-frame flow (:76-152) and MLBWInpaintVideo
    12-frame clip queue with flush (:154-310)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.logger import logger
from .backward_warp import (
    apply_divergence_nn_delta_weight, postprocess_hole_mask,
)
from .models.light_inpaint_v1 import LightInpaintV1, inpaint_infer
from .models.light_video_inpaint_v1 import (
    LightVideoInpaintV1, video_inpaint_infer, SEQ_LEN,
)
from .models.mlbw import MLBW

MASK_MLBW_THRESHOLD = 0.15


def _random_init(model, x_shape, mask=False):
    kwargs = {"mask": jnp.zeros(x_shape[:-1] + (1,))} if mask else {}
    return model.init(jax.random.PRNGKey(0), jnp.zeros(x_shape),
                      train=False, **kwargs)["params"]


def make_mask_mlbw():
    """The hole-mask predicting MLBW (reference load_mask_mlbw:
    iw3_mask_mlbw_l2_d1 checkpoint = MLBW l2 with a mask head)."""
    return MLBW(num_layers=2, hole_mask=True)


import functools


@functools.lru_cache(maxsize=32)
def _jitted_warp(mask_model, shift, preserve_screen_border, divergence):
    # divergence is STATIC (part of the cache key): _delta_max_shift needs
    # a concrete value to pick the bounded shift-and-blend warp — a traced
    # divergence silently falls back to the XLA gather path, which costs
    # ~47 ms/frame/layer at 1080p (profiled: 4 gather fusions of 377 ms
    # per 8-frame batch = ~190 ms/frame, the assembled pipeline's single
    # biggest cost) vs ~2 ms/frame bounded.
    @jax.jit
    def fn(params, c, depth, convergence):
        return apply_divergence_nn_delta_weight(
            mask_model, params, c, depth, divergence=divergence,
            convergence=convergence, shift=shift,
            preserve_screen_border=preserve_screen_border, return_mask=True)
    return fn


def _warp_with_mask(mask_model, mask_params, c, depth, divergence,
                    convergence, shift, preserve_screen_border):
    return _jitted_warp(mask_model, shift, preserve_screen_border,
                        float(divergence))(
        mask_params, c, depth, jnp.asarray(convergence, jnp.float32))


class _MLBWInpaintBase:
    def __init__(self, inpaint_model=None, inpaint_params=None,
                 mask_model=None, mask_params=None):
        if mask_model is None:
            mask_model = make_mask_mlbw()
            mask_params = _random_init(mask_model, (1, 64, 64, 3))
            logger.warning("MLBWInpaint: random-init mask-MLBW "
                           "(no checkpoint); structure/smoke use only")
        self.mask_model = mask_model
        self.mask_params = mask_params
        self.inpaint_model = inpaint_model
        self.inpaint_params = inpaint_params

    def _warp(self, x, depth, divergence, convergence, synthetic_view,
              preserve_screen_border):
        """reference apply_divergence (:37-73)."""
        if synthetic_view == "both":
            left, lmask = _warp_with_mask(
                self.mask_model, self.mask_params, x, depth, divergence,
                convergence, -1, preserve_screen_border)
            right, rmask = _warp_with_mask(
                self.mask_model, self.mask_params, x, depth, divergence,
                convergence, 1, preserve_screen_border)
        elif synthetic_view == "right":
            left, lmask = x, None
            right, rmask = _warp_with_mask(
                self.mask_model, self.mask_params, x, depth, divergence * 2,
                convergence, 1, preserve_screen_border)
        else:
            left, lmask = _warp_with_mask(
                self.mask_model, self.mask_params, x, depth, divergence * 2,
                convergence, -1, preserve_screen_border)
            right, rmask = x, None
        return left, right, lmask, rmask

    def reset(self):
        pass


class MLBWInpaint(_MLBWInpaintBase):
    """Single-frame variant (reference MLBWInpaintImage :76-152)."""

    def __init__(self, inpaint_model=None, inpaint_params=None, **kwargs):
        if inpaint_model is None:
            inpaint_model = LightInpaintV1()
            inpaint_params = _random_init(inpaint_model, (1, 64, 64, 3),
                                          mask=True)
            logger.warning("MLBWInpaint: random-init inpaint model "
                           "(no checkpoint); structure/smoke use only")
        super().__init__(inpaint_model, inpaint_params, **kwargs)

    def _inpaint_side(self, eye, mask_logits, inner_dilation, outer_dilation,
                      flip):
        if flip:
            eye = eye[:, :, ::-1, :]
            mask_logits = mask_logits[:, :, ::-1, :]
        mask = postprocess_hole_mask(
            mask_logits, eye.shape[1:3], MASK_MLBW_THRESHOLD,
            inner_dilation=inner_dilation, outer_dilation=outer_dilation)
        eye = inpaint_infer(self.inpaint_model, self.inpaint_params,
                            eye, mask)
        if flip:
            eye = eye[:, :, ::-1, :]
        return eye

    def infer(self, x, depth, divergence, convergence, synthetic_view="both",
              preserve_screen_border=False, inner_dilation=0,
              outer_dilation=0, **kwargs):
        left, right, lmask, rmask = self._warp(
            x, depth, divergence, convergence, synthetic_view,
            preserve_screen_border)
        if lmask is not None:
            left = self._inpaint_side(left, lmask, inner_dilation,
                                      outer_dilation, flip=True)
        if rmask is not None:
            right = self._inpaint_side(right, rmask, inner_dilation,
                                       outer_dilation, flip=False)
        return left, right

    def flush(self, **kwargs):
        return None, None


class MLBWInpaintVideo(_MLBWInpaintBase):
    """12-frame clip variant (reference MLBWInpaintVideo :154-310): frames
    queue until a SEQ_LEN clip is ready; infer returns (None, None) until
    then; flush processes the remainder (edge-padded)."""

    def __init__(self, inpaint_model=None, inpaint_params=None, **kwargs):
        if inpaint_model is None:
            inpaint_model = LightVideoInpaintV1()
            inpaint_params = _random_init(
                inpaint_model, (SEQ_LEN, 64, 64, 3), mask=True)
            logger.warning("MLBWInpaintVideo: random-init video inpaint "
                           "model (no checkpoint); structure/smoke use only")
        super().__init__(inpaint_model, inpaint_params, **kwargs)
        self._queue = []   # (left, right, lmask, rmask) per frame batch

    def reset(self):
        self._queue = []

    def _inpaint_clip(self, eyes, mask_logits, inner_dilation,
                      outer_dilation, flip):
        if flip:
            eyes = eyes[:, :, ::-1, :]
            mask_logits = mask_logits[:, :, ::-1, :]
        mask = postprocess_hole_mask(
            mask_logits, eyes.shape[1:3], MASK_MLBW_THRESHOLD,
            inner_dilation=inner_dilation, outer_dilation=outer_dilation)
        out = video_inpaint_infer(self.inpaint_model, self.inpaint_params,
                                  eyes, mask)
        if flip:
            out = out[:, :, ::-1, :]
        return out

    def _drain(self, count, inner_dilation, outer_dilation):
        items = self._queue[:count]
        del self._queue[:count]
        lefts = jnp.concatenate([i[0] for i in items], axis=0)
        rights = jnp.concatenate([i[1] for i in items], axis=0)
        if items[0][2] is not None:
            lmask = jnp.concatenate([i[2] for i in items], axis=0)
            lefts = self._inpaint_clip(lefts, lmask, inner_dilation,
                                       outer_dilation, flip=True)
        if items[0][3] is not None:
            rmask = jnp.concatenate([i[3] for i in items], axis=0)
            rights = self._inpaint_clip(rights, rmask, inner_dilation,
                                        outer_dilation, flip=False)
        return lefts, rights

    def infer(self, x, depth, divergence, convergence, synthetic_view="both",
              preserve_screen_border=False, inner_dilation=0,
              outer_dilation=0, **kwargs):
        left, right, lmask, rmask = self._warp(
            x, depth, divergence, convergence, synthetic_view,
            preserve_screen_border)
        for i in range(x.shape[0]):
            self._queue.append((
                left[i:i + 1], right[i:i + 1],
                None if lmask is None else lmask[i:i + 1],
                None if rmask is None else rmask[i:i + 1]))
        if len(self._queue) >= SEQ_LEN:
            n = (len(self._queue) // SEQ_LEN) * SEQ_LEN
            return self._drain(n, inner_dilation, outer_dilation)
        return None, None

    def flush(self, inner_dilation=0, outer_dilation=0, **kwargs):
        if not self._queue:
            return None, None
        return self._drain(len(self._queue), inner_dilation, outer_dilation)

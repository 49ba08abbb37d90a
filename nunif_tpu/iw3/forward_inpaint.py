"""Forward warp + learned inpainting of disocclusions.

Behavioral parity target: reference iw3/forward_inpaint.py:18-105 —
forward-warp both eyes with masks, close/dilate the masks, run the
inpainting net (right-view base; the left eye is processed flipped).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.logger import logger
from .dilation import mask_closing, dilate_inner, dilate_outer
from .forward_warp import apply_divergence_forward_warp
from .models.light_inpaint_v1 import LightInpaintV1, inpaint_infer
from ..modules.resize import resize


def _inpaint_side(model, params, eye, mask, inner_dilation, outer_dilation,
                  base_width, flip: bool):
    if flip:
        eye = eye[:, :, ::-1, :]
        mask = mask[:, :, ::-1, :]
    mask = mask_closing((mask > 0).astype(jnp.float32))
    mask = dilate_outer(mask, n_iter=outer_dilation, base_width=base_width)
    mask = dilate_inner(mask, n_iter=inner_dilation, base_width=base_width)
    eye = inpaint_infer(model, params, eye, mask)
    if flip:
        eye = eye[:, :, ::-1, :]
    return eye


class ForwardInpaint:
    """reference iw3/forward_inpaint.py ForwardInpaintImage."""

    def __init__(self, model=None, params=None):
        if model is None:
            model = LightInpaintV1()
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                mask=jnp.zeros((1, 64, 64, 1)), train=False)["params"]
            logger.warning("ForwardInpaint: random init (no checkpoint); "
                           "structure/smoke use only")
        self.model = model
        self.params = params

    def infer(self, x, depth, divergence, convergence, synthetic_view="both",
              inner_dilation=0, outer_dilation=0, max_width=None, **kwargs):
        if max_width is not None and x.shape[2] > max_width:
            max_width += max_width % 2
            new_w = max_width
            new_h = int((max_width / x.shape[2]) * x.shape[1])
            new_h += new_h % 2
            x = resize(x, new_h, new_w, mode="bilinear", antialias=True)
        left, right, lmask, rmask = apply_divergence_forward_warp(
            x, depth, divergence, convergence, synthetic_view=synthetic_view,
            return_mask=True, width_base=False)
        kw = dict(inner_dilation=inner_dilation,
                  outer_dilation=outer_dilation,
                  base_width=depth.shape[2])
        if synthetic_view == "both":
            left = _inpaint_side(self.model, self.params, left, lmask,
                                 flip=True, **kw)
            right = _inpaint_side(self.model, self.params, right, rmask,
                                  flip=False, **kw)
        elif synthetic_view == "right":
            right = _inpaint_side(self.model, self.params, right, rmask,
                                  flip=False, **kw)
        else:
            left = _inpaint_side(self.model, self.params, left, lmask,
                                 flip=True, **kw)
        return left, right

    def flush(self, **kwargs):
        return None, None

"""iw3 image pipeline: preprocess -> depth -> divergence -> composition.

Behavioral parity target: reference iw3/utils.py:
  * preprocess_image rotate / max-height resize (:247-271)
  * apply_divergence dispatch (:292-391)
  * process_image flow (:497-560)

All NHWC float [0,1].
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..modules.resize import resize
from .backward_warp import (
    apply_divergence_grid_sample, apply_divergence_nn_LR,
)
from .forward_warp import apply_divergence_forward_warp
from .composition import StereoFormat, postprocess_image
from .mapper import get_mapper, resolve_mapper_name


@dataclasses.dataclass
class StereoConfig:
    """Subset of the reference arg namespace driving stereo generation."""
    method: str = "row_flow_v3"
    divergence: float = 2.0
    convergence: float = 0.5
    mapper: Optional[str] = None
    foreground_scale: float = 0
    synthetic_view: str = "both"   # both | right | left
    preserve_screen_border: bool = False
    warp_steps: Optional[int] = None
    stereo_width: Optional[int] = None
    # inpaint-method mask shaping (reference --mask-inner-dilation/
    # --mask-outer-dilation/--inpaint-max-width)
    mask_inner_dilation: int = 0
    mask_outer_dilation: int = 0
    inpaint_max_width: Optional[int] = None
    rotate_left: bool = False
    rotate_right: bool = False
    max_output_width: Optional[int] = None
    max_output_height: Optional[int] = None
    keep_aspect_ratio: bool = False
    format: StereoFormat = dataclasses.field(default_factory=StereoFormat)

    def resolved_mapper(self, metric_depth: bool) -> str:
        return resolve_mapper_name(self.mapper, self.foreground_scale,
                                   metric_depth=metric_depth)


def preprocess_image(x, cfg: StereoConfig):
    """reference iw3/utils.py:247-271.  x: (B,H,W,C)."""
    if cfg.rotate_left:
        x = jnp.rot90(x, 1, axes=(1, 2))
    elif cfg.rotate_right:
        x = jnp.rot90(x, 3, axes=(1, 2))
    H, W = x.shape[1:3]
    new_w, new_h = W, H
    if cfg.max_output_height is not None and new_h > cfg.max_output_height:
        new_w = int(cfg.max_output_height / new_h * new_w)
        new_h = cfg.max_output_height
    if (new_w, new_h) != (W, H):
        new_h -= new_h % 2
        new_w -= new_w % 2
        x = jnp.clip(resize(x, new_h, new_w, mode="bicubic", antialias=True),
                     0, 1)
    return x


def apply_divergence(depth, im, cfg: StereoConfig, side_model=None,
                     side_params=None, metric_depth: bool = False,
                     convergence=None):
    """reference iw3/utils.py:292-391.  depth (B,H,W,1), im (B,H,W,3).

    ``convergence``: optional per-frame (B,) override from the saliency
    ConvergenceEstimator (reference --convergence-mode sod_v1)."""
    mapper_fn = get_mapper(cfg.resolved_mapper(metric_depth))
    if convergence is None:
        convergence = cfg.convergence
    depth = mapper_fn(depth)

    if cfg.method == "NULL":
        return im, im
    if cfg.method in {"forward_inpaint", "mlbw_l2_inpaint",
                      "mlbw_l2_inpaint_video"}:
        assert side_model is not None, f"{cfg.method} needs an inpaint model"
        return side_model.infer(
            im, depth, cfg.divergence, convergence,
            synthetic_view=cfg.synthetic_view,
            inner_dilation=cfg.mask_inner_dilation,
            outer_dilation=cfg.mask_outer_dilation,
            max_width=cfg.inpaint_max_width)
    if cfg.method in {"grid_sample", "backward"}:
        return apply_divergence_grid_sample(
            im, depth, cfg.divergence, convergence,
            synthetic_view=cfg.synthetic_view)
    if cfg.method in {"forward", "forward_fill"}:
        return apply_divergence_forward_warp(
            im, depth, cfg.divergence, convergence,
            method=cfg.method, synthetic_view=cfg.synthetic_view,
            width_base=False)
    # row_flow*, mlbw*
    if cfg.stereo_width is not None:
        H, W = im.shape[1:3]
        stereo_width = min(W, cfg.stereo_width)
        if depth.shape[2] != stereo_width:
            new_w = stereo_width
            new_h = int(H * (stereo_width / W))
            depth = jnp.clip(resize(depth, new_h, new_w, mode="bilinear",
                                    antialias=True), 0, 1)
    assert side_model is not None, f"method {cfg.method} needs a stereo model"
    return apply_divergence_nn_LR(
        side_model, side_params, im, depth, cfg.divergence, convergence,
        steps=cfg.warp_steps, synthetic_view=cfg.synthetic_view,
        preserve_screen_border=cfg.preserve_screen_border)


def process_image(x, cfg: StereoConfig, depth_model, side_model=None,
                  side_params=None, tta=False, edge_dilation=0,
                  return_depth=False):
    """Full single-image flow (reference iw3/utils.py:497-560).

    x: (B,H,W,3) or (H,W,3) in [0,1].  Returns the composed frame(s).
    """
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    x = preprocess_image(x, cfg)
    depth = depth_model.infer(x, tta=tta, edge_dilation=edge_dilation)
    normalized = depth_model.minmax_normalize(depth)
    assert normalized, "depth scaler must have buffer_size=1 for images"
    depth = jnp.stack(normalized, axis=0)
    # depth stays at preprocess resolution for the NN/forward warps (they
    # resize internally); only the plain grid-sample path needs same-size
    if cfg.method in {"grid_sample", "backward", "NULL"} and \
            depth.shape[1:3] != x.shape[1:3]:
        depth = jnp.clip(resize(depth, x.shape[1], x.shape[2],
                                mode="bilinear", antialias=False), 0, 1)
    left, right = apply_divergence(depth, x, cfg, side_model, side_params,
                                   metric_depth=depth_model.is_metric())
    out = postprocess_image(left, right, cfg.format)
    if not batch:
        out = out[0]
    if return_depth:
        return out, depth
    return out

"""Image resize as separable matmuls — TPU-native.

Replaces torch F.interpolate (reference usage: waifu2x/models/swin_unet.py:253,
nunif/modules/antialiased_bicubic.py, iw3 depth preprocess).  Instead of
gather-based sampling, the 1-D resampling weights are baked into
(out, in) matrices at trace time (numpy) and applied as two einsums —
dense matmuls that run on the MXU and fuse with neighbours.

Matches torch semantics: bicubic kernel a=-0.75, align_corners=False,
antialias widens the kernel support by the scale factor when downscaling.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x <= 1.0, ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2.0, (((x - 5) * x + 8) * x - 4) * a, 0.0))


def _linear(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(1.0 - x, 0.0)


def _box(x: np.ndarray) -> np.ndarray:
    return ((x > -0.5) & (x <= 0.5)).astype(np.float64)


def _lanczos(x: np.ndarray, taps: int = 3) -> np.ndarray:
    y = np.sinc(x) * np.sinc(x / taps)
    return np.where(np.abs(x) < taps, y, 0.0)


_KERNELS = {
    "bicubic": (_cubic, 2.0),
    "bilinear": (_linear, 1.0),
    "box": (_box, 0.5),
    "lanczos": (_lanczos, 3.0),
    "catrom": (functools.partial(_cubic, a=-0.5), 2.0),
}


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, mode: str = "bicubic",
                  antialias: bool = True,
                  align_corners: bool = False) -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic resampling matrix.
    align_corners=False is the pixel-center convention; True matches torch
    F.interpolate(align_corners=True) (corner-anchored, no antialias)."""
    kernel, support = _KERNELS[mode]
    if mode == "bicubic" and antialias:
        # torch's antialias path is PIL-compatible: cubic a=-0.5
        kernel = functools.partial(_cubic, a=-0.5)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        filter_scale = 1.0
        out_coords = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        # antialias only matters when downscaling
        filter_scale = max(scale, 1.0) if antialias else 1.0
        out_coords = (np.arange(out_size) + 0.5) * scale - 0.5
    half = support * filter_scale
    lo = np.floor(out_coords - half).astype(np.int64)
    n_taps = int(np.ceil(2 * half)) + 2
    taps = lo[:, None] + np.arange(n_taps)[None, :]  # (out, taps)
    dist = (out_coords[:, None] - taps) / filter_scale
    w = kernel(dist)
    oob = (taps < 0) | (taps >= in_size)
    if antialias and filter_scale > 1.0:
        # torch/PIL antialias: out-of-range taps are dropped, remaining
        # weights renormalized
        w = np.where(oob, 0.0, w)
    # else: replicate-edge — out-of-range taps fold onto the border pixel
    w_sum = w.sum(axis=1, keepdims=True)
    w = w / np.where(w_sum == 0, 1.0, w_sum)
    m = np.zeros((out_size, in_size), np.float64)
    clamped = np.clip(taps, 0, in_size - 1)
    np.add.at(m, (np.repeat(np.arange(out_size), n_taps), clamped.reshape(-1)),
              w.reshape(-1))
    return m.astype(np.float32)


def resize(x, out_h: int, out_w: int, mode: str = "bicubic",
           antialias: bool = True, align_corners: bool = False):
    """Resize (..., H, W, C) to (..., out_h, out_w, C)."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dt = x.dtype
    shape = x.shape
    mh = jnp.asarray(resize_matrix(in_h, out_h, mode, antialias,
                                   align_corners), jnp.float32)
    mw = jnp.asarray(resize_matrix(in_w, out_w, mode, antialias,
                                   align_corners), jnp.float32)
    # explicit-rank einsums (ellipsis einsums compile pathologically slowly
    # on the XLA CPU backend); batch dims are flattened into one axis
    xb = x.astype(jnp.float32).reshape((-1,) + shape[-3:])
    # full-fp32 matmuls: the env default matmul precision is reduced (bf16
    # passes) which visibly bands 8-bit image gradients
    y = jnp.einsum("oh,bhwc->bowc", mh, xb, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.reshape(shape[:-3] + (out_h, out_w, shape[-1])).astype(dt)


def scale_by(x, factor: float, mode: str = "bicubic", antialias: bool = True):
    h, w = x.shape[-3], x.shape[-2]
    return resize(x, int(round(h * factor)), int(round(w * factor)),
                  mode=mode, antialias=antialias)

"""Depth-edge dilation and mask morphology (NHWC).

Behavioral parity target: reference iw3/dilation.py (gaussian_blur kernel,
edge_weight z-score ramp, dilate_edge loop, dilate/erode/closing,
dilate_inner/dilate_outer horizontal mask growth).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..modules.pad import replication_pad2d
from ..modules.pool import max_pool2d, min_pool2d

_GAUSS_KERNEL = np.array([
    [21, 31, 21],
    [31, 48, 31],
    [21, 31, 21],
], dtype=np.float32) / 256.0


def edge_dilation_parse(edge_dilation):
    # reference iw3/dilation.py:5-21
    if isinstance(edge_dilation, (list, tuple)):
        if len(edge_dilation) == 0:
            x = y = 0
        elif len(edge_dilation) == 1:
            x = y = edge_dilation[0]
        else:
            x, y = edge_dilation[0], edge_dilation[1]
    elif isinstance(edge_dilation, int):
        x = y = edge_dilation
    elif edge_dilation is None:
        x = y = 0
    else:
        raise ValueError(f"Unsupported edge_dilation type {type(edge_dilation)}")
    return x, y


def edge_dilation_is_enabled(edge_dilation) -> bool:
    x, y = edge_dilation_parse(edge_dilation)
    return x != 0 or y != 0


def gaussian_blur(x):
    """3x3 fixed gaussian, replicate pad (reference iw3/dilation.py:30-38)."""
    k = jnp.asarray(_GAUSS_KERNEL).reshape(3, 3, 1, 1)
    x32 = replication_pad2d(x.astype(jnp.float32), (1, 1, 1, 1))
    C = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x32, jnp.tile(k, (1, 1, 1, C)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return out.astype(x.dtype)


def dilate(mask, kernel_size=3):
    return max_pool2d(mask, kernel_size, stride=1)


def erode(mask, kernel_size=3):
    return min_pool2d(mask, kernel_size, stride=1)


def closing(mask, kernel_size=3, n_iter=2):
    mask = mask.astype(jnp.float32)
    for _ in range(n_iter):
        mask = dilate(mask, kernel_size)
    for _ in range(n_iter):
        mask = erode(mask, kernel_size)
    return mask


def mask_closing(mask, kernel_size=3, n_iter=2):
    # reference iw3/dilation.py:150-158: re-add erased isolated pixels
    mask_org = mask.astype(jnp.float32)
    m = closing(mask_org, kernel_size=kernel_size, n_iter=n_iter)
    return jnp.clip(m + mask_org, 0.0, 1.0)


def _dilate_x(mask, n_iter: int, direction: int):
    """Grow a boolean mask horizontally by n_iter pixels.

    The reference does n sequential shift-ORs (iw3/dilation.py:67-99); an
    n-wide asymmetric max-pool does the same in one fused reduce_window.
    direction: +1 grows rightward sources (pad left), -1 leftward.
    """
    if n_iter <= 0:
        return mask
    dtype = mask.dtype
    m = mask.astype(jnp.float32)
    k = n_iter + 1
    pads = (n_iter, 0) if direction > 0 else (0, n_iter)
    out = jax.lax.reduce_window(
        m, 0.0, jax.lax.max,
        window_dimensions=(1, 1, k, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), pads, (0, 0)))
    return out.astype(dtype)


def dilate_outer(mask, n_iter, base_width=None):
    # reference iw3/dilation.py:67-80: mask |= shift_right(mask)
    if n_iter <= 0:
        return mask
    if base_width is not None:
        n_iter = max(round(mask.shape[-2] / base_width * n_iter), 1)
    return _dilate_x(mask, n_iter, direction=+1)


def dilate_inner(mask, n_iter, base_width=None):
    # reference iw3/dilation.py:83-96: mask |= shift_left(mask)
    if n_iter <= 0:
        return mask
    if base_width is not None:
        n_iter = max(round(mask.shape[-2] / base_width * n_iter), 1)
    return _dilate_x(mask, n_iter, direction=-1)


def edge_weight(x):
    """Normalized local-range z-score weight (reference iw3/dilation.py:102-114)."""
    assert x.ndim == 4
    x32 = x.astype(jnp.float32)
    max_v = max_pool2d(x32, 3, stride=1)
    min_v = min_pool2d(x32, 3, stride=1)
    range_v = max_v - min_v
    mean = jnp.mean(range_v, axis=(1, 2, 3), keepdims=True)
    range_c = range_v - mean
    range_s = jnp.sqrt(jnp.mean(range_c ** 2, axis=(1, 2, 3), keepdims=True))
    w = jnp.clip(range_c / (range_s + 1e-6), -3, 3)
    w_min = jnp.min(w, axis=(1, 2, 3), keepdims=True)
    w_max = jnp.max(w, axis=(1, 2, 3), keepdims=True)
    return (w - w_min) / ((w_max - w_min) + 1e-6)


def dilate_edge(x, n):
    """Edge-weighted blurred dilation of a depth map (reference iw3/dilation.py:117-140).

    n: int or (x_iter, y_iter).
    """
    x_iter, y_iter = edge_dilation_parse(n)
    xy_iter = min(x_iter, y_iter)
    x_iter -= xy_iter
    y_iter -= xy_iter

    def step(x, kernel):
        w = edge_weight(x)
        x2 = gaussian_blur(x)
        x2 = dilate(x2, kernel)
        return x * (1 - w) + x2 * w

    for _ in range(xy_iter):
        x = step(x, (3, 3))
    for _ in range(y_iter):
        x = step(x, (3, 1))
    for _ in range(x_iter):
        x = step(x, (1, 3))
    return x

"""Pooling ops (NHWC) via XLA reduce_window.

Covers the reference's F.max_pool2d / F.avg_pool2d(count_include_pad=False)
usages (reference: iw3/dilation.py:42-55, iw3/forward_warp.py:6-9).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def max_pool2d(x, kernel_size, stride=1, padding=None):
    """Max pool NHWC. padding defaults to kernel//2 (same as the reference)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    if padding is None:
        ph, pw = kh // 2, kw // 2
    else:
        ph, pw = _pair(padding)
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)))


def min_pool2d(x, kernel_size, stride=1, padding=None):
    return -max_pool2d(-x, kernel_size, stride=stride, padding=padding)


def avg_pool2d(x, kernel_size, stride=1, padding=None,
               count_include_pad: bool = False):
    """Average pool NHWC; count_include_pad=False matches the reference's
    box_blur (iw3/forward_warp.py:6-9)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    if padding is None:
        ph, pw = kh // 2, kw // 2
    else:
        ph, pw = _pair(padding)
    pads = ((0, 0), (ph, ph), (pw, pw), (0, 0))
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1), padding=pads)
    if count_include_pad:
        return (s / (kh * kw)).astype(x.dtype)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1), padding=pads)
    return (s / cnt).astype(x.dtype)


def box_blur(x, kernel_size: int = 7):
    """Reference iw3/forward_warp.py:6-9."""
    return avg_pool2d(x, kernel_size, stride=1, count_include_pad=False)


def soft_pool2d(x, kernel_size=2, stride=None, eps=1e-6):
    """SoftPool (arXiv:2101.00440); reference nunif/modules/softpool.py:10-30.

    Exponential-weighted average pooling; weights are shared across
    channels (sum of exp over the channel axis), matching the reference.
    """
    stride = stride if stride is not None else kernel_size
    x32 = x.astype(jnp.float32)
    e_x = jnp.sum(jnp.exp(x32), axis=-1, keepdims=True)
    e_x = jnp.clip(e_x, 0.0, jnp.finfo(jnp.float32).max)
    num = avg_pool2d(x32 * e_x, kernel_size, stride=stride, padding=0,
                     count_include_pad=True)
    den = avg_pool2d(e_x, kernel_size, stride=stride, padding=0,
                     count_include_pad=True)
    return (num / (den + eps)).astype(x.dtype)


def soft_pool_downscale(x, downscale_factor, eps=1e-6):
    """reference nunif/modules/softpool.py:33-43."""
    assert downscale_factor in {2, 4, 8}
    assert x.shape[1] % downscale_factor == 0 and x.shape[2] % downscale_factor == 0
    return soft_pool2d(x, downscale_factor, stride=downscale_factor, eps=eps)

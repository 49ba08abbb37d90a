"""Local standard-deviation gradient mask.

Behavioral parity target: reference nunif/modules/local_std_mask.py —
per-pixel std over a kxk window (correction=0), averaged over channels,
clamped to a weight in [min_weight, 1]; ``local_std_mask`` lerps x with
stop-gradient(x) by that weight so flat regions get less gradient.

TPU re-design: the reference unfolds kxk patches (O(k^2) memory); here
std = sqrt(E[x^2] - E[x]^2) with two box filters — O(1) memory, fused by
XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pad import reflection_pad2d
from .pool import avg_pool2d


def compute_local_std_mask(y, kernel_size=15, max_std=0.1, min_weight=0.1):
    y = jax.lax.stop_gradient(y.astype(jnp.float32))
    p = (kernel_size - 1) // 2
    yp = reflection_pad2d(y, (p, p, p, p))
    m1 = avg_pool2d(yp, kernel_size, stride=1, padding=0,
                    count_include_pad=True)
    m2 = avg_pool2d(yp * yp, kernel_size, stride=1, padding=0,
                    count_include_pad=True)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    std = jnp.sqrt(var).mean(axis=-1, keepdims=True)
    w = jnp.clip(jnp.minimum(std, max_std) / max_std, min_weight, None)
    return w


def local_std_mask(x, y, kernel_size=15, max_std=0.1, min_weight=0.1):
    assert x.shape == y.shape
    w = compute_local_std_mask(y, kernel_size=kernel_size, max_std=max_std,
                               min_weight=min_weight).astype(x.dtype)
    return x * w + jax.lax.stop_gradient(x) * (1 - w)

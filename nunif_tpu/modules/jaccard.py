"""Jaccard index (IoU) eval metric.

Behavioral parity target: reference nunif/modules/jaccard.py — thresholded
IoU averaged over channels then batch; empty-union => 1.0.  Vectorized
(no per-image Python loops).
"""
from __future__ import annotations

import jax.numpy as jnp


def jaccard_index(input, target, threshold=0.5):
    """input/target: (B,H,W,C), (H,W,C) or (H,W).  Returns scalar."""
    if input.ndim == 2:
        input, target = input[..., None], target[..., None]
    if input.ndim == 3:
        input, target = input[None], target[None]
    assert input.shape == target.shape and input.ndim == 4
    a = (input >= threshold).astype(jnp.float32)
    b = (target >= threshold).astype(jnp.float32)
    inter = jnp.sum(a * b, axis=(1, 2))          # (B, C)
    union = jnp.sum(a, axis=(1, 2)) + jnp.sum(b, axis=(1, 2)) - inter
    score = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 1.0)
    return float(score.mean())

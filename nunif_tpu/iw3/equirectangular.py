"""VR180 equirectangular projection.

Behavioral parity target: reference iw3/equirectangular.py:7-40 — pad the
eye image to a square-ish canvas, then bicubic grid-sample through the
tan(azimuth)/tan(elevation) mapping.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..modules.pad import zero_pad2d
from ..modules.grid_sample import grid_sample


def equirectangular_projection(c):
    """c: (B,H,W,C) -> (B,S,S,C) where S = max_edge * 1.5."""
    B, h, w, _ = c.shape
    max_edge = max(h, w)
    output_size = max_edge + max_edge // 2
    pad_w = (output_size - w) // 2
    pad_h = (output_size - h) // 2
    c = zero_pad2d(c, (pad_w, pad_w, pad_h, pad_h))

    H, W = c.shape[1:3]
    y = jnp.linspace(-1, 1, H, dtype=jnp.float32)
    x = jnp.linspace(-1, 1, W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    azimuth = xx * (math.pi * 0.5)
    elevation = yy * (math.pi * 0.5)
    mesh_x = (max_edge / output_size) * jnp.tan(azimuth)
    mesh_y = (max_edge / output_size) * (jnp.tan(elevation) / jnp.cos(azimuth))
    grid = jnp.stack([mesh_x, mesh_y], axis=-1)[None].repeat(B, axis=0)

    z = grid_sample(c, grid, mode="bicubic", padding_mode="zeros",
                    align_corners=True)
    return jnp.clip(z, 0.0, 1.0)

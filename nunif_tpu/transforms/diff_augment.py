"""Differentiable pair augmentations for GAN training (diff-augment).

Behavioral parity target: reference nunif/modules/transforms.py —
DiffPairRandomTranslate (:169-213), DiffPairRandomRotate (:216-257),
DiffPairRandomDownsample (:260-274): the same random transform is applied
to (input, target) so the discriminator cannot detect the augmentation.

TPU re-design: transforms are pure functions of an explicit PRNG key (no
global randomness), shift/rotate run as gather-free jnp ops, and the
rotate uses our grid_sample; everything jit-compatible with static
shapes (downsample picks from a static scale set via lax.switch).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..modules.grid_sample import grid_sample
from ..modules.resize import resize


def diff_translate(x, x_shift, y_shift):
    """Integer-pixel roll + zero fill; differentiable w.r.t. x."""
    B, H, W, C = x.shape
    ix = jnp.arange(W)[None, None, :] - x_shift[:, None, None]
    iy = jnp.arange(H)[None, :, None] - y_shift[:, None, None]
    valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    bidx = jnp.arange(B)[:, None, None]
    out = x[bidx, iy, ix, :]
    return out * valid[..., None].astype(x.dtype)


def diff_pair_random_translate(key, x, y, ratio=0.15):
    """Same random (dx, dy) on both tensors (reference :169-213)."""
    B, H, W, _ = x.shape
    kx, ky = jax.random.split(key)
    max_x = int(W * ratio)
    max_y = int(H * ratio)
    dx = jax.random.randint(kx, (B,), -max_x, max_x + 1)
    dy = jax.random.randint(ky, (B,), -max_y, max_y + 1)
    return diff_translate(x, dx, dy), diff_translate(y, dx, dy)


def _rotate(x, angle_rad):
    """Rotate around center, bilinear, zeros padding (per-batch angle)."""
    B, H, W, C = x.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cos = jnp.cos(angle_rad)[:, None, None]
    sin = jnp.sin(angle_rad)[:, None, None]
    gx = cos * (xx[None] - cx) - sin * (yy[None] - cy) + cx
    gy = sin * (xx[None] - cx) + cos * (yy[None] - cy) + cy
    # normalize to [-1, 1] (align_corners=False convention)
    gxn = (gx + 0.5) * 2.0 / W - 1.0
    gyn = (gy + 0.5) * 2.0 / H - 1.0
    grid = jnp.stack([gxn, gyn], axis=-1)
    return grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                       align_corners=False)


def diff_pair_random_rotate(key, x, y, angle=45):
    B = x.shape[0]
    a = jax.random.uniform(key, (B,), minval=-angle, maxval=angle)
    a = a * (math.pi / 180.0)
    return _rotate(x, a), _rotate(y, a)


def diff_pair_random_downsample(key, x, y, scale_factor_min=0.5,
                                scale_factor_max=1.0, steps=4):
    """Random common downsample (reference :260-274).  Static shape set:
    one of `steps` scales is chosen via lax.switch, output is resized back
    to the original size so shapes stay static under jit."""
    H, W = x.shape[1:3]
    scales = [scale_factor_min + (scale_factor_max - scale_factor_min)
              * i / (steps - 1) for i in range(steps)]

    def make_branch(s):
        h, w = max(2, int(H * s)), max(2, int(W * s))

        def branch(args):
            xx, yy = args
            xd = resize(xx, h, w, mode="bilinear", antialias=True)
            yd = resize(yy, h, w, mode="bilinear", antialias=True)
            return (resize(xd, H, W, mode="bilinear", antialias=False),
                    resize(yd, H, W, mode="bilinear", antialias=False))
        return branch

    idx = jax.random.randint(key, (), 0, steps)
    return jax.lax.switch(idx, [make_branch(s) for s in scales], (x, y))

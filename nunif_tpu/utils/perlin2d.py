"""2D Perlin / fractal noise (jax).

Behavioral parity target: reference nunif/utils/perlin2d.py (the
perlin-numpy port): gradient-grid Perlin noise with quintic fade and
octave-stacked fractal noise.  Pure function of a PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _fade(t):
    return 6 * t ** 5 - 15 * t ** 4 + 10 * t ** 3


def generate_perlin_noise_2d(key, shape, res, tileable=(False, False)):
    """shape: (H, W) multiples of res: (rh, rw).  Returns (H, W) in ~[-1,1]."""
    H, W = shape
    rh, rw = res
    assert H % rh == 0 and W % rw == 0
    d0, d1 = H // rh, W // rw

    angles = 2.0 * jnp.pi * jax.random.uniform(key, (rh + 1, rw + 1))
    grads = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    if tileable[0]:
        grads = grads.at[-1, :].set(grads[0, :])
    if tileable[1]:
        grads = grads.at[:, -1].set(grads[:, 0])

    # local coordinates within each cell
    gy = (jnp.arange(H) % d0) / d0
    gx = (jnp.arange(W) % d1) / d1
    grid = jnp.stack(jnp.meshgrid(gy, gx, indexing="ij"), axis=-1)  # (H,W,2)

    def tile(sl0, sl1):
        g = grads[sl0, sl1]
        return jnp.repeat(jnp.repeat(g, d0, axis=0), d1, axis=1)[:H, :W]

    def dot(grad, shift):
        s = grid + jnp.asarray(shift, grid.dtype)
        return (s * grad).sum(-1)

    n00 = dot(tile(slice(0, -1), slice(0, -1)), (0, 0))
    n10 = dot(tile(slice(1, None), slice(0, -1)), (-1, 0))
    n01 = dot(tile(slice(0, -1), slice(1, None)), (0, -1))
    n11 = dot(tile(slice(1, None), slice(1, None)), (-1, -1))
    t = _fade(grid)
    n0 = n00 * (1 - t[..., 0]) + t[..., 0] * n10
    n1 = n01 * (1 - t[..., 0]) + t[..., 0] * n11
    return jnp.sqrt(2.0) * ((1 - t[..., 1]) * n0 + t[..., 1] * n1)


def generate_fractal_noise_2d(key, shape, res, octaves=1, persistence=0.5,
                              tileable=(False, False)):
    noise = jnp.zeros(shape, jnp.float32)
    freq, amp = 1, 1.0
    for i in range(octaves):
        key, sub = jax.random.split(key)
        noise = noise + amp * generate_perlin_noise_2d(
            sub, shape, (freq * res[0], freq * res[1]), tileable)
        freq *= 2
        amp *= persistence
    return noise

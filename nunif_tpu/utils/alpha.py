"""Alpha-border padding (reference: nunif/utils/alpha.py:32-57).

Transparent pixels get RGB values diffused outward from opaque neighbours so
valid-conv models don't bleed background color at alpha edges.  The
reference's Python loop of masked 3x3 sums becomes a fixed-trip
``lax.fori_loop`` inside jit — fully device-side.
"""
import functools

import jax
import jax.numpy as jnp


def _sum3(x):
    """3x3 box sum via two separable pads+adds (cheap on VPU).
    x: (H, W, C)."""
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    # rows
    s = xp[:-2] + xp[1:-1] + xp[2:]
    return s[:, :-2] + s[:, 1:-1] + s[:, 2:]


@functools.partial(jax.jit, static_argnames=("offset",))
def alpha_border_pad(rgb, alpha, offset: int):
    """rgb: (H, W, 3), alpha: (H, W, 1) in [0,1]. Returns padded rgb."""
    mask = (alpha > 0).astype(rgb.dtype)
    rgb = rgb * mask

    def body(_, carry):
        rgb, mask = carry
        weight = _sum3(mask)
        border = _sum3(rgb) / (weight + 1e-7)
        rgb = jnp.where(mask < 1.0, border, rgb)
        mask = (weight > 0).astype(rgb.dtype)
        return rgb, mask

    rgb, _ = jax.lax.fori_loop(0, offset, body, (rgb, mask))
    return jnp.clip(rgb, 0.0, 1.0)

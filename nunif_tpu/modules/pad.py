"""Padding ops, NHWC layout (reference: nunif/modules/pad.py, reflection_pad2d.py).

All functions take (..., H, W, C) arrays and a (left, right, top, bottom)
pad spec, matching the reference's torch F.pad convention order.
"""
import jax.numpy as jnp


def _pad_hw(x, pads, mode, **kwargs):
    left, right, top, bottom = pads
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (top, bottom)
    cfg[-2] = (left, right)
    return jnp.pad(x, cfg, mode=mode, **kwargs)


def replication_pad2d(x, pads):
    return _pad_hw(x, pads, "edge")


def reflection_pad2d(x, pads):
    return _pad_hw(x, pads, "reflect")


def zero_pad2d(x, pads):
    return _pad_hw(x, pads, "constant", constant_values=0)


def constant_pad2d(x, pads, value):
    return _pad_hw(x, pads, "constant", constant_values=value)


def crop2d(x, crops):
    """Negative padding: crop (left, right, top, bottom) pixels from H/W."""
    left, right, top, bottom = crops
    h, w = x.shape[-3], x.shape[-2]
    return x[..., top:h - bottom if bottom else h,
             left:w - right if right else w, :]


def pad2d(x, pads, mode="zeros", value=0.0):
    """Dispatch helper. Negative entries crop, positive pad."""
    if any(p < 0 for p in pads):
        assert all(p <= 0 for p in pads)
        return crop2d(x, tuple(-p for p in pads))
    if mode in ("zeros", "constant"):
        return constant_pad2d(x, pads, value)
    if mode in ("replicate", "edge"):
        return replication_pad2d(x, pads)
    if mode in ("reflect", "reflection"):
        return reflection_pad2d(x, pads)
    raise ValueError(mode)

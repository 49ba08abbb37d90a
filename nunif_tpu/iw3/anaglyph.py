"""Red-cyan anaglyph composition.

Behavioral parity target: reference iw3/anaglyph.py (color/gray/half-color/
wimmer/wimmer2/dubois variants).  NHWC, channels-last.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_DUBOIS_L = np.array([[0.437, 0.449, 0.164],
                      [-0.062, -0.062, -0.024],
                      [-0.048, -0.050, -0.017]], dtype=np.float32)
_DUBOIS_R = np.array([[-0.011, -0.032, -0.007],
                      [0.377, 0.761, 0.009],
                      [-0.026, -0.093, 1.234]], dtype=np.float32)


def grayscale_bt601(x, num_output_channels: int = 1):
    y = x[..., 0:1] * 0.299 + x[..., 1:2] * 0.587 + x[..., 2:3] * 0.114
    return jnp.concatenate([y] * num_output_channels, axis=-1)


def _color(left_eye, right_eye):
    return jnp.concatenate([left_eye[..., 0:1], right_eye[..., 1:3]], axis=-1)


def _half_color(left_eye, right_eye):
    return jnp.clip(jnp.concatenate(
        [grayscale_bt601(left_eye, 1), right_eye[..., 1:3]], axis=-1), 0, 1)


def _gray(left_eye, right_eye):
    ly = grayscale_bt601(left_eye, 3)
    ry = grayscale_bt601(right_eye, 3)
    return jnp.clip(jnp.concatenate([ly[..., 0:1], ry[..., 1:3]], axis=-1), 0, 1)


def _wimmer(left_eye, right_eye):
    r = left_eye[..., 1:2] * 0.7 + left_eye[..., 2:3] * 0.3
    return jnp.clip(jnp.concatenate([r, right_eye[..., 1:3]], axis=-1), 0, 1)


def _wimmer2(left_eye, right_eye):
    g_l = left_eye[..., 1:2] + 0.45 * jnp.clip(left_eye[..., 0:1] - left_eye[..., 1:2], 0, None)
    b_l = left_eye[..., 2:3] + 0.25 * jnp.clip(left_eye[..., 0:1] - left_eye[..., 2:3], 0, None)
    g_r = right_eye[..., 1:2] + 0.45 * jnp.clip(right_eye[..., 0:1] - right_eye[..., 1:2], 0, None)
    b_r = right_eye[..., 2:3] + 0.25 * jnp.clip(right_eye[..., 0:1] - right_eye[..., 2:3], 0, None)
    left = (0.75 * g_l + 0.25 * b_l) ** (1.0 / 1.6)
    return jnp.clip(jnp.concatenate([left, g_r, b_r], axis=-1), 0, 1)


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(x):
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


def _dubois(left_eye, right_eye, clip_before: bool = True):
    le = _srgb_to_linear(left_eye.astype(jnp.float32))
    re = _srgb_to_linear(right_eye.astype(jnp.float32))
    lm = jnp.asarray(_DUBOIS_L)
    rm = jnp.asarray(_DUBOIS_R)

    def dot_clip(x, vec):
        v = jnp.sum(x * vec.reshape(1, 1, 1, 3), axis=-1, keepdims=True)
        return jnp.clip(v, 0, 1) if clip_before else v

    out = jnp.concatenate([dot_clip(le, lm[i]) + dot_clip(re, rm[i])
                           for i in range(3)], axis=-1)
    out = jnp.clip(out, 0, 1)
    return jnp.clip(_linear_to_srgb(out), 0, 1)


def apply_anaglyph_redcyan(left_eye, right_eye, anaglyph_type: str):
    # reference iw3/anaglyph.py:95-113
    if anaglyph_type == "color":
        return _color(left_eye, right_eye)
    if anaglyph_type == "gray":
        return _gray(left_eye, right_eye)
    if anaglyph_type == "half-color":
        return _half_color(left_eye, right_eye)
    if anaglyph_type == "wimmer":
        return _wimmer(left_eye, right_eye)
    if anaglyph_type == "wimmer2":
        return _wimmer2(left_eye, right_eye)
    if anaglyph_type in {"dubois", "dubois2"}:
        return _dubois(left_eye, right_eye, clip_before=(anaglyph_type == "dubois"))
    raise ValueError(f"Unknown anaglyph_type {anaglyph_type}")


ANAGLYPH_TYPES = ["color", "gray", "half-color", "wimmer", "wimmer2",
                  "dubois", "dubois2"]

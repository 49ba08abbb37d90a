"""cliqa patch extraction + predictors (reference cliqa/utils.py:16-99)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH_SIZE = 128


def std_score(patches):
    # (N, P, P, C) -> per-patch mean channel std
    return patches.std(axis=(1, 2)).mean(axis=-1)


def tv_score(patches):
    yg = np.abs(patches[:, 1:, :, :] - patches[:, :-1, :, :])
    xg = np.abs(patches[:, :, 1:, :] - patches[:, :, :-1, :])
    return (yg.mean(axis=(1, 2, 3)) + xg.mean(axis=(1, 2, 3))) * 0.5


def extract_patches(im: np.ndarray, num_patches: int,
                    patch_size: int = PATCH_SIZE, score_fn=std_score):
    """im: HWC float [0,1] -> (k, P, P, C) top-variance patches."""
    h, w = im.shape[:2]
    if h < patch_size or w < patch_size:
        ph, pw = max(0, patch_size - h), max(0, patch_size - w)
        im = np.pad(im, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = im.shape[:2]
    patches = []
    for y in range(0, h - patch_size + 1, patch_size):
        for x in range(0, w - patch_size + 1, patch_size):
            patches.append(im[y:y + patch_size, x:x + patch_size])
    patches = np.stack(patches)
    scores = score_fn(patches)
    k = min(num_patches, len(scores))
    idx = np.argsort(scores)[::-1][:k]
    return patches[idx]


def predict_jpeg_quality(model, params, x, num_patches=8,
                         patch_size=PATCH_SIZE):
    """x: HWC [0,1] image or (N,P,P,C) patches -> (quality, p_subsampled)."""
    if x.ndim == 3:
        x = extract_patches(np.asarray(x), num_patches, patch_size)
    quality, subsampling = model.apply_fn(params, jnp.asarray(x))
    quality = float(jnp.clip(jnp.mean(quality), 0, 100))
    subsampling_prob = float(jnp.mean(jax.nn.sigmoid(subsampling)))
    return quality, subsampling_prob


def predict_grain_noise_psnr(model, params, x, num_patches=8,
                             patch_size=PATCH_SIZE):
    if x.ndim == 3:
        x = extract_patches(np.asarray(x), num_patches, patch_size)
    noise_level = model.apply_fn(params, jnp.asarray(x))
    noise_level = float(jnp.clip(jnp.mean(noise_level), 0, 50))
    return 50.0 - noise_level


def predict_resize_quality(model, params, x, num_patches=8,
                           patch_size=PATCH_SIZE):
    if x.ndim == 3:
        x = extract_patches(np.asarray(x), num_patches, patch_size,
                            score_fn=tv_score)
    scale_factor = model.apply_fn(params, jnp.asarray(x))
    return 100 - int((float(jnp.min(scale_factor)) - 1.0) * 100)

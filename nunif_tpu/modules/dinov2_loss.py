"""DINOv2 perceptual feature losses.

Behavioral parity target: reference nunif/modules/dinov2.py —
DINOv2IntermediateFeatures (4 tapped transformer blocks, optional seeded
random projection to 64ch), DINOv2CosineLoss / DINOv2PoolLoss and the
`*With` composites used by waifu2x losses "l1dinov2", "l1dinov2_10",
"yrgb_lbp_dinov2" (waifu2x/training/trainer.py:107-109).

The trunk is this package's DINOv2 ViT (iw3/depth/dinov2.py) — the same
module the Depth-Anything port uses — so converted DINOv2 weights load
through ``models.torch_convert.convert_depth_anything``'s trunk mapping.
Without a checkpoint the trunk is random-init: still a stationary random
feature projector (usable signal, documented structure/benchmark caveat —
the build environment has no hub access).

TPU notes: inputs are reflection-padded to a multiple of 14 (static pad),
features are computed in bf16 with fp32 loss math, and the target branch
is stop-gradient (reference detaches target features).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.logger import logger

_PATCH = 14
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
_LAYER_INDEX = {"vits": (2, 5, 8, 11), "vitb": (2, 5, 8, 11),
                "vitl": (4, 11, 17, 23)}
_DIMS = {"vits": 384, "vitb": 768, "vitl": 1024}


def _pad_to_patch(x):
    h, w = x.shape[1], x.shape[2]
    ph, pw = (-h) % _PATCH, (-w) % _PATCH
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)), mode="reflect")
    return x


def _random_projection(model_type: str, dim: int):
    """reference dinov2.py:84-93 — seeded gaussian 1x1 projection with the
    1/14 gradient-scale adjustment."""
    feat = _DIMS[model_type]
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((feat, dim)).astype(np.float32)
    return proj * (feat ** -0.5) * (1.0 / 14.0)


class DINOv2Features:
    """Frozen intermediate-feature extractor.

    params=None -> random init (PRNGKey(0)); pass converted trunk params
    for parity with the reference's pretrained dinov2_{vits,vitb,vitl}14.
    """

    def __init__(self, model_type="vits", index=None, random_projection=None,
                 params=None):
        from ..iw3.depth.dinov2 import DinoVisionTransformer, VIT_CONFIGS
        cfg = VIT_CONFIGS[model_type]
        self.model = DinoVisionTransformer(**cfg)
        self.index = tuple(index) if index else _LAYER_INDEX[model_type]
        if params is None:
            logger.warning("DINOv2Features: random-init trunk "
                           "(no pretrained checkpoint in this environment)")
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, _PATCH * 2, _PATCH * 2, 3), jnp.float32),
                out_indices=self.index)
        self.params = jax.lax.stop_gradient(params)
        self.proj = (jnp.asarray(_random_projection(model_type,
                                                    random_projection))
                     if random_projection else None)

    def __call__(self, x):
        """x: (B,H,W,3), H,W multiples of 14 -> list of (B,h,w,C) maps."""
        feats, (ph, pw) = self.model.apply(
            self.params, x.astype(jnp.bfloat16), out_indices=self.index)
        feats = [f.astype(jnp.float32).reshape(f.shape[0], ph, pw, f.shape[-1])
                 for f in feats]
        if self.proj is not None:
            feats = [jnp.einsum("bhwc,cd->bhwd", f, self.proj)
                     for f in feats]
        return feats


def _normalize_in(x):
    mean = jnp.asarray(_MEAN, x.dtype)
    std = jnp.asarray(_STD, x.dtype)
    return (x - mean) / std


def _cosine_loss(a, b):
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    num = jnp.sum(a32 * b32, axis=-1)
    den = jnp.linalg.norm(a32, axis=-1) * jnp.linalg.norm(b32, axis=-1)
    return jnp.mean(1.0 - num / jnp.maximum(den, 1e-8))


def _pool_l1_loss(a, b, kernel_size=3):
    """reference dinov2.py Pool: x + avg_pool(x, k, stride 1) then L1."""
    def pool(x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), "SAME")
        c = jax.lax.reduce_window(
            jnp.ones_like(x), 0.0, jax.lax.add,
            (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), "SAME")
        return x + s / c

    return jnp.mean(jnp.abs(pool(a) - pool(b)))


def dinov2_feature_loss(kind="pool", model_type="vits", normalize=True,
                        params=None):
    """kind in {"pool", "cosine"} — reference DINOv2PoolLoss (random 64ch
    projection + neighborhood-pool L1) / DINOv2CosineLoss (full-dim cosine).
    Returns fn(x, y): mean over the 4 tapped layers, target detached."""
    extractor = DINOv2Features(
        model_type=model_type,
        random_projection=64 if kind == "pool" else None,
        params=params)
    inner = _pool_l1_loss if kind == "pool" else _cosine_loss

    def wrapped(x, y):
        x, y = _pad_to_patch(x), _pad_to_patch(y)
        if normalize:
            x, y = _normalize_in(x), _normalize_in(y)
        fx = extractor(x)
        fy = [jax.lax.stop_gradient(f) for f in extractor(y)]
        total = sum(inner(a, b) for a, b in zip(fx, fy))
        return total / len(fx)
    return wrapped


def dinov2_with(base_loss, kind="pool", weight=1.0, model_type="vits",
                params=None):
    """reference DINOv2PoolWith / DINOv2CosineWith: base + weight*feature."""
    feat = dinov2_feature_loss(kind=kind, model_type=model_type,
                               params=params)

    def wrapped(x, y):
        return base_loss(x, y) + weight * feat(x, y)
    return wrapped

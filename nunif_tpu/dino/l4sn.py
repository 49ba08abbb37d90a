"""L4SN — 4-level spectral-norm feature network (NHWC flax).

Behavioral parity target: reference dino/models/l4sn.py:31-120 (strided
spectral-norm conv pyramid, feature taps after each level, window sliced
Wasserstein distance) — used as the waifu2x GAN feature loss (l1l4sn).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..models import Model, register_model
from ..modules.conv import leaky_relu
from ..waifu2x.models.discriminator import SNConv
from ..modules.permute import window_partition

C1, C2, C3, C4, C5 = 32, 64, 128, 256, 512
FEAT_DIMS = [C2, C3, C4, C5]


def _normalize(x):
    return (x - 0.5) / 0.5


class L4SNFeature(Model):
    """reference l4sn.py:31-91."""
    model_name = "dino.l4sn_feature"

    @nn.compact
    def __call__(self, x, train: bool = False, activation: bool = True):
        assert x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0
        x = _normalize(x)
        h = SNConv(C1, (3, 3), padding="SAME", name="l1_0")(x)
        h = leaky_relu(h, 0.2)
        h = SNConv(C2, (4, 4), strides=(2, 2),
                   padding=((1, 1), (1, 1)), name="l1_2")(h)
        h = leaky_relu(h, 0.2)
        x1 = SNConv(C2, (3, 3), padding="SAME", name="l1_4")(h)

        h = SNConv(C3, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                   name="l2_0")(leaky_relu(x1, 0.2))
        h = leaky_relu(h, 0.2)
        x2 = SNConv(C3, (3, 3), padding="SAME", name="l2_2")(h)

        h = SNConv(C4, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                   name="l3_0")(leaky_relu(x2, 0.2))
        h = leaky_relu(h, 0.2)
        x3 = SNConv(C4, (3, 3), padding="SAME", name="l3_2")(h)

        h = SNConv(C5, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                   name="l4_0")(leaky_relu(x3, 0.2))
        h = leaky_relu(h, 0.2)
        x4 = SNConv(C5, (3, 3), padding="SAME", name="l4_2")(h)

        if activation:
            return [leaky_relu(x1, 0.2), leaky_relu(x2, 0.2),
                    leaky_relu(x3, 0.2), leaky_relu(x4, 0.2)]
        return [x1, x2, x3, x4]


@register_model
class L4SN(Model):
    """Classifier head over L4SNFeature (reference l4sn.py:94-107)."""
    model_name = "dino.l4sn"
    num_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = L4SNFeature(name="feature")(x, activation=True)
        h = jnp.mean(feats[-1], axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=h.dtype, name="fc")(h)


def window_sliced_wasserstein(x, y, window_size: int = 8):
    """reference l4sn.py:110-123 — per-window sorted-activation L1."""
    window_size = min(window_size, x.shape[1], x.shape[2])
    xw = window_partition(x, window_size)   # (B*N, w, w, C)
    yw = window_partition(y, window_size)
    n, w, _, c = xw.shape
    xw = xw.reshape(n, w * w, c)
    yw = yw.reshape(n, w * w, c)
    xs = jnp.sort(xw, axis=1)
    ys = jnp.sort(yw, axis=1)
    return jnp.mean(jnp.abs(xs - ys))


def l4sn_feature_loss(model, params, x, y, weight: float = 1.0,
                      swd_weight: float = 0.0):
    """L1 over the 4 feature levels (+ optional sliced Wasserstein) —
    the waifu2x 'l1l4sn' loss family (reference trainer LOSS_FUNCTIONS)."""
    fx = model.apply_fn(params, x)
    fy = model.apply_fn(params, y)
    loss = sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fx, fy)) / len(fx)
    if swd_weight > 0:
        loss = loss + swd_weight * window_sliced_wasserstein(fx[-1], fy[-1])
    return loss * weight

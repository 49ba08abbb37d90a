"""LPIPS perceptual distance (VGG16 flavor, flax NHWC).

Behavioral parity target: reference nunif/modules/lpips.py — LPIPS with
the norm-fix (rsqrt normalization in fp32), detached target features, and
the reference's re-trained linear weights (bundled `_lpips_2.pth`,
converted to `_lpips_lins.npz` in this package).  The VGG16 trunk weights
must be converted from torchvision via
``nunif_tpu.models.torch_convert`` for numeric parity; a random trunk is
used otherwise (structure/tests).

LPIPSWith (reference :74-120): base_loss + weight * LPIPS, with optional
local-std gradient masking.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .local_std_mask import local_std_mask

# VGG16 conv layout: (channels, convs-per-stage); LPIPS taps relu1_2,
# relu2_2, relu3_3, relu4_3, relu5_3
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        k = 0
        for si, (ch, n) in enumerate(_VGG_STAGES):
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=x.dtype,
                            name=f"conv{k}")(x)
                x = nn.relu(x)
                k += 1
            taps.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(x, y): inputs in [-1, 1] (use normalize=True for [0, 1])."""

    def setup(self):
        self.net = VGG16Features()
        lins = np.load(os.path.join(os.path.dirname(__file__),
                                    "_lpips_lins.npz"))
        self._lins = [jnp.asarray(lins[f"lin{i}"]) for i in range(5)]

    def __call__(self, in0, in1, normalize: bool = False):
        if normalize:
            in0 = 2 * in0 - 1
            in1 = 2 * in1 - 1
        shift = jnp.asarray(_SHIFT, in0.dtype)
        scale = jnp.asarray(_SCALE, in0.dtype)
        outs0 = self.net((in0 - shift) / scale)
        outs1 = self.net((in1 - shift) / scale)
        val = 0.0
        for f0, f1, lin in zip(outs0, outs1, self._lins):
            # norm-fix: fp32 rsqrt normalization (reference :14-16)
            f0 = f0.astype(jnp.float32)
            f1 = jax.lax.stop_gradient(f1.astype(jnp.float32))
            f0 = f0 * jax.lax.rsqrt(jnp.sum(f0 ** 2 + 1e-8, axis=-1,
                                            keepdims=True))
            f1 = f1 * jax.lax.rsqrt(jnp.sum(f1 ** 2 + 1e-8, axis=-1,
                                            keepdims=True))
            diff = (f0 - f1) ** 2
            # 1x1 non-negative linear head, then spatial average
            w = jnp.maximum(lin, 0.0)
            val = val + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
        return val  # (B,)


def lpips_with(base_loss, weight=1.0, std_mask=False):
    """reference LPIPSWith: returns loss_fn(params, x, y) given LPIPS
    params (init via ``LPIPS().init(...)``)."""
    model = LPIPS()

    def loss_fn(lpips_params, input, target):
        x = input
        if std_mask:
            x = local_std_mask(x, target)
        p = model.apply(lpips_params, x, target, normalize=True)
        return base_loss(input, target) + weight * jnp.mean(p)

    return loss_fn

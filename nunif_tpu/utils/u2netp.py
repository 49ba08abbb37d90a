"""U2-Net-p salient object detection (flax, NHWC).

Architecture parity target: reference nunif/utils/u2netp.py:11-470
(vendored from xuebinqin/U-2-Net, small variant): RSU7..RSU4 U-blocks +
dilated RSU4F, 6-stage encoder/decoder with side outputs fused by a 1x1
conv.  BatchNorm folds into convs at conversion (the reference itself
ships a fuse() for that).

The generic RSU module parameterizes the reference's RSU7/6/5/4 copies by
height; RSU4F is the dilated variant.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..models import Model, register_model
from ..modules.resize import resize


def _rebnconv(x, out_ch, dirate, name):
    x = nn.Conv(out_ch, (3, 3), kernel_dilation=(dirate, dirate),
                padding=((dirate, dirate), (dirate, dirate)),
                dtype=x.dtype, name=name)(x)
    return nn.relu(x)


def _up_like(src, tar):
    return resize(src, tar.shape[1], tar.shape[2], mode="bilinear",
                  antialias=False)


def _pool_ceil(x):
    # MaxPool2d(2, stride=2, ceil_mode=True)
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        pad = jnp.full((B, H + ph, W + pw, C), -jnp.inf, x.dtype)
        x = pad.at[:, :H, :W].set(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class RSU(nn.Module):
    """Residual U-block of given height (reference RSU7/6/5/4)."""
    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = _rebnconv(x, self.out_ch, 1, "rebnconvin")
        enc = []
        h = hxin
        for i in range(1, self.height):
            h = _rebnconv(h, self.mid_ch, 1, f"rebnconv{i}")
            enc.append(h)
            if i < self.height - 1:
                h = _pool_ceil(h)
        h = _rebnconv(h, self.mid_ch, 2, f"rebnconv{self.height}")
        for i in range(self.height - 1, 0, -1):
            skip = enc[i - 1]
            if h.shape[1:3] != skip.shape[1:3]:
                h = _up_like(h, skip)
            out_c = self.out_ch if i == 1 else self.mid_ch
            h = _rebnconv(jnp.concatenate([h, skip], axis=-1), out_c, 1,
                          f"rebnconv{i}d")
        return h + hxin


class RSU4F(nn.Module):
    """Dilated flat variant (reference :287-318)."""
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = _rebnconv(x, self.out_ch, 1, "rebnconvin")
        h1 = _rebnconv(hxin, self.mid_ch, 1, "rebnconv1")
        h2 = _rebnconv(h1, self.mid_ch, 2, "rebnconv2")
        h3 = _rebnconv(h2, self.mid_ch, 4, "rebnconv3")
        h4 = _rebnconv(h3, self.mid_ch, 8, "rebnconv4")
        h3d = _rebnconv(jnp.concatenate([h4, h3], -1), self.mid_ch, 4,
                        "rebnconv3d")
        h2d = _rebnconv(jnp.concatenate([h3d, h2], -1), self.mid_ch, 2,
                        "rebnconv2d")
        h1d = _rebnconv(jnp.concatenate([h2d, h1], -1), self.out_ch, 1,
                        "rebnconv1d")
        return h1d + hxin


@register_model
class U2NETP(Model):
    """reference :321-470.  __call__ -> (d0..d6) sigmoid saliency maps."""
    model_name = "aux.u2netp"
    out_ch: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        hx1 = RSU(7, 16, 64, name="stage1")(x)
        hx = _pool_ceil(hx1)
        hx2 = RSU(6, 16, 64, name="stage2")(hx)
        hx = _pool_ceil(hx2)
        hx3 = RSU(5, 16, 64, name="stage3")(hx)
        hx = _pool_ceil(hx3)
        hx4 = RSU(4, 16, 64, name="stage4")(hx)
        hx = _pool_ceil(hx4)
        hx5 = RSU4F(16, 64, name="stage5")(hx)
        hx = _pool_ceil(hx5)
        hx6 = RSU4F(16, 64, name="stage6")(hx)

        hx6up = _up_like(hx6, hx5)
        hx5d = RSU4F(16, 64, name="stage5d")(
            jnp.concatenate([hx6up, hx5], -1))
        hx5dup = _up_like(hx5d, hx4)
        hx4d = RSU(4, 16, 64, name="stage4d")(
            jnp.concatenate([hx5dup, hx4], -1))
        hx4dup = _up_like(hx4d, hx3)
        hx3d = RSU(5, 16, 64, name="stage3d")(
            jnp.concatenate([hx4dup, hx3], -1))
        hx3dup = _up_like(hx3d, hx2)
        hx2d = RSU(6, 16, 64, name="stage2d")(
            jnp.concatenate([hx3dup, hx2], -1))
        hx2dup = _up_like(hx2d, hx1)
        hx1d = RSU(7, 16, 64, name="stage1d")(
            jnp.concatenate([hx2dup, hx1], -1))

        def side(h, name):
            d = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=h.dtype,
                        name=name)(h)
            return _up_like(d, x) if h.shape[1:3] != x.shape[1:3] else d

        d1 = side(hx1d, "side1")
        d2 = side(hx2d, "side2")
        d3 = side(hx3d, "side3")
        d4 = side(hx4d, "side4")
        d5 = side(hx5d, "side5")
        d6 = side(hx6, "side6")
        d0 = nn.Conv(self.out_ch, (1, 1), padding="VALID", dtype=x.dtype,
                     name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1))
        return tuple(nn.sigmoid(d.astype(jnp.float32))
                     for d in (d0, d1, d2, d3, d4, d5, d6))

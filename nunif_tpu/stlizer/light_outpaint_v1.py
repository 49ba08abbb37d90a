"""stlizer.light_outpaint_v1 — coarse blurred border outpainting (NHWC).

Behavioral parity target: reference stlizer/models/light_outpaint_v1.py
:12-200 — PoolBlock (avg-pool contrast + GLU conv MLP), window-MHA blocks
with learned score bias, 8x strided-conv downsampling encoder, narrow
U-shaped middle, bilinear to-image head; forward composites the predicted
borders into the masked source.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models import I2IBaseModel, register_model
from ..modules.attention import WindowMHA2d, WindowScoreBias
from ..modules.conv import leaky_relu
from ..modules.pad import replication_pad2d, crop2d
from ..modules.pool import avg_pool2d, max_pool2d
from ..modules.resize import resize


class PoolBlock(nn.Module):
    """reference :12-32: local-contrast (pool - x) GLU MLP, residual."""
    in_channels: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        h = avg_pool2d(x, self.kernel_size, stride=1,
                       count_include_pad=False) - x
        h = nn.Conv(c * 2, (1, 1), padding="VALID", dtype=x.dtype,
                    name="mlp_0")(h)
        h = leaky_relu(h, 0.2)
        h = replication_pad2d(h, (1, 1, 1, 1))
        h = nn.Conv(c * 2, (3, 3), padding="VALID", dtype=x.dtype,
                    feature_group_count=c * 2, name="mlp_3")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = nn.Conv(c, (1, 1), padding="VALID", dtype=x.dtype,
                    name="mlp_5")(h)
        return x + h


class MHABlock(nn.Module):
    """reference :35-52."""
    in_channels: int
    window_size: int = 8
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        bias = WindowScoreBias((self.window_size, self.window_size),
                               name="bias")()
        x = x + WindowMHA2d(c, self.num_heads,
                            (self.window_size, self.window_size),
                            name="mha")(x, attn_mask=bias)
        h = nn.Conv(c * 2, (1, 1), padding="VALID", dtype=x.dtype,
                    name="mlp_0")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = nn.Conv(c, (1, 1), padding="VALID", dtype=x.dtype,
                    name="mlp_2")(h)
        return x + h


class OutpaintBase(nn.Module):
    """reference :89-153."""
    dim: int = 64
    window_size: int = 8

    @nn.compact
    def __call__(self, x, mask_f):
        C = self.dim
        C2 = C // 2
        h = jnp.concatenate([x, mask_f.astype(x.dtype)], axis=-1)
        # 3-step strided downsampling: 1/2, 1/4, 1/8
        for i, ch in enumerate((C // 8, C // 4, C)):
            h = replication_pad2d(h, (1, 1, 1, 1))
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=x.dtype, name=f"dct_{i}")(h)
            h = leaky_relu(h, 0.2)
        h = MHABlock(C, num_heads=C // 32, name="enc_mha")(h)
        h = PoolBlock(C, name="enc_pool")(h)
        m = nn.Conv(C2, (1, 1), padding="VALID", dtype=x.dtype,
                    name="proj_mid")(h)
        m = MHABlock(C2, num_heads=C2 // 32, name="mid_mha1")(m)
        m = PoolBlock(C2, name="mid_pool1")(m)
        m = MHABlock(C2, num_heads=C2 // 32, name="mid_mha2")(m)
        m = PoolBlock(C2, name="mid_pool2")(m)
        h = h + nn.Conv(C, (1, 1), padding="VALID", dtype=x.dtype,
                        name="proj_out")(m)
        h = MHABlock(C, num_heads=C // 32, name="dec_mha")(h)
        h = PoolBlock(C, name="dec_pool")(h)
        h = nn.Conv(3, (1, 1), padding="VALID", dtype=x.dtype,
                    name="to_image")(h)
        return resize(h, h.shape[1] * self.window_size,
                      h.shape[2] * self.window_size, mode="bilinear",
                      antialias=False)


@register_model
class LightOutpaintV1(I2IBaseModel):
    model_name = "stlizer.light_outpaint_v1"
    i2i_scale = 1
    i2i_offset = 0
    i2i_blend_size = 0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        """x (B,H,W,3) source with masked borders; mask (B,H,W,1)
        1 = outside (to be outpainted)."""
        assert mask is not None
        mod = 8 * 8
        B, H, W, _ = x.shape
        pad1 = (mod - W % mod) % mod
        pad2 = (mod - H % mod) % mod
        xp = replication_pad2d(x, (0, pad1, 0, pad2))
        mask_f = mask.astype(x.dtype)
        if pad1 or pad2:
            mask_f = jnp.pad(mask_f, ((0, 0), (0, pad2), (0, pad1), (0, 0)),
                             constant_values=1.0)
            xp = xp * (1 - mask_f)
        z = OutpaintBase(64, 8, name="net")(xp, mask_f)
        z = crop2d(z, (0, pad1, 0, pad2))
        mask3 = jnp.broadcast_to(mask.astype(z.dtype), z.shape)
        out = x.astype(z.dtype) * (1 - mask3) + z * mask3
        if train:
            return out, z
        return jnp.clip(out, 0.0, 1.0)


@functools.lru_cache(maxsize=16)
def _jitted_outpaint(model):
    @jax.jit
    def fn(params, x, mask):
        return model.apply_fn(params, x, mask=mask, train=False)
    return fn


def outpaint_infer(model, params, x, mask, max_size=640):
    """reference :176-200: run the net at <= max_size, composite the
    full-resolution borders."""
    H, W = x.shape[1:3]
    if max(H, W) > max_size:
        if H > W:
            nh, nw = max_size, round(W * (max_size / H))
        else:
            nh, nw = round(H * (max_size / W)), max_size
        xs = resize(x, nh, nw, mode="bilinear", antialias=False)
        ms = resize(mask.astype(x.dtype), nh, nw, mode="bilinear",
                    antialias=False)
        ms = (max_pool2d(ms, 3, stride=1) > 0.5).astype(x.dtype)
        xs = xs * (1 - ms)
        z = _jitted_outpaint(model)(params, xs, ms)
        z = resize(z, H, W, mode="bilinear", antialias=False)
        mask3 = jnp.broadcast_to(mask.astype(z.dtype), z.shape)
        return jnp.clip(x * (1 - mask3) + z * mask3, 0.0, 1.0)
    return _jitted_outpaint(model)(params, x, mask)

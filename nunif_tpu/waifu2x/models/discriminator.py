"""waifu2x GAN discriminators — l3/v1 family (NHWC flax).

Behavioral parity target: reference waifu2x/models/l3v1c.py:20-255 and
disc_utils.py (normalize to [-1,1], modcrop(8), ImageToCondition embedding,
L3/V1 (+conditional, +ensemble) with loss_weights (0.8, 0.2)), res block
reference nunif/modules/res_block.py:108 (GroupNorm32 + LeakyReLU 0.2).

Spectral norm: the reference wraps the final convs in torch spectral_norm
(stateful power iteration).  Here sigma is estimated with a fixed number of
power iterations from a deterministic start vector each forward — stateless
(pure function of the kernel), which keeps the GAN step a plain jitted
function of params.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...models import Model, register_model, register_model_factory
from ...modules.conv import leaky_relu
from ...modules.pad import replication_pad2d, reflection_pad2d, crop2d
from .cunet import SEBlock


def normalize(x):
    return x * 2.0 - 1.0


def modcrop(x, n):
    """Center-crop H, W to multiples of n (reference disc_utils.modcrop)."""
    H, W = x.shape[1:3]
    dh, dw = H % n, W % n
    if dh == 0 and dw == 0:
        return x
    return crop2d(x, (dw // 2, dw - dw // 2, dh // 2, dh - dh // 2))


def fit_to_size(x, cond):
    """Reflection-pad cond up to x's size (reference disc_utils.fit_to_size)."""
    dh = x.shape[1] - cond.shape[1]
    dw = x.shape[2] - cond.shape[2]
    if dh == 0 and dw == 0:
        return cond
    if dh < 0 or dw < 0:
        return crop2d(cond, ((-dw) // 2, (-dw) - (-dw) // 2,
                             (-dh) // 2, (-dh) - (-dh) // 2))
    return reflection_pad2d(cond, (dw // 2, dw - dw // 2,
                                   dh // 2, dh - dh // 2))


def _spectral_sigma(kernel, n_iter: int = 5):
    """Largest singular value by power iteration from a fixed start."""
    w = kernel.reshape(-1, kernel.shape[-1]).astype(jnp.float32)
    v = jnp.ones((w.shape[-1],), jnp.float32) / np.sqrt(w.shape[-1])
    for _ in range(n_iter):
        u = w @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
    return jnp.dot(u, w @ v)


class SNConv(nn.Module):
    """Conv2d with stateless spectral normalization."""
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = "SAME"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel_size + (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel / _spectral_sigma(kernel)
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), self.strides,
            self.padding if isinstance(self.padding, str) else tuple(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(x.dtype)


class ResBlockGNLReLU(nn.Module):
    """reference nunif/modules/res_block.py:11-76 with GroupNorm32 +
    LeakyReLU(0.2), stride 1, zeros padding."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=x.dtype, name="conv_0")(x)
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="gn_1")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=x.dtype, name="conv_3")(h)
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="gn_4")(
            h.astype(jnp.float32)).astype(x.dtype)
        if x.shape[-1] != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), padding="VALID",
                         dtype=x.dtype, name="identity_conv")(x)
            sc = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                              name="identity_gn")(
                sc.astype(jnp.float32)).astype(x.dtype)
        else:
            sc = x
        return leaky_relu(h + sc, 0.2)


def adaptive_avg_pool(x, out_hw):
    """torch AdaptiveAvgPool2d semantics, static shapes."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    out = []
    for i in range(oh):
        r0, r1 = (i * H) // oh, -(-(i + 1) * H) // oh
        row = []
        for j in range(ow):
            c0, c1 = (j * W) // ow, -(-(j + 1) * W) // ow
            row.append(jnp.mean(x[:, r0:r1, c0:c1], axis=(1, 2)))
        out.append(jnp.stack(row, axis=1))
    return jnp.stack(out, axis=1)  # (B, oh, ow, C)


class ImageToCondition(nn.Module):
    """reference l3v1c.py:20-51."""
    embed_dim: int
    outputs: tuple
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        x = normalize(x)
        if self.scale_factor > 1:
            s = self.scale_factor
            x = nn.avg_pool(x, (s, s), strides=(s, s))
        x = replication_pad2d(x, (1, 1, 1, 1))
        x = nn.Conv(self.embed_dim, (3, 3), padding="VALID", dtype=x.dtype,
                    name="features_1")(x)
        x = nn.GroupNorm(num_groups=4, dtype=jnp.float32, name="features_2")(
            x.astype(jnp.float32)).astype(x.dtype)
        x = nn.relu(x)
        x = adaptive_avg_pool(x, (4, 4))
        x = nn.Dense(self.embed_dim, dtype=x.dtype,
                     name="aggregate")(x.reshape(B, -1))
        conds = []
        for i, out_c in enumerate(self.outputs):
            h = nn.Dense(self.embed_dim, dtype=x.dtype, name=f"fc_{i}_0")(x)
            h = nn.relu(h)
            h = nn.Dense(out_c, dtype=x.dtype, name=f"fc_{i}_2")(h)
            conds.append(h.reshape(B, 1, 1, out_c))
        return conds


class Discriminator(Model):
    loss_weights = (1.0,)


@register_model
class L3Discriminator(Discriminator):
    """reference l3v1c.py:58-91."""
    model_name = "waifu2x.l3_discriminator"
    in_channels: int = 3
    out_channels: int = 1
    negative_slope: float = 0.2
    conditional: bool = False
    scale_factor: int = 4

    @nn.compact
    def __call__(self, x, c=None, scale_factor=None, train: bool = False):
        x = modcrop(x, 8)
        cond = None
        if self.conditional:
            c = fit_to_size(x, c)
            cond = ImageToCondition(32, (64, 256), self.scale_factor,
                                    name="to_cond")(c)
        x = normalize(x)
        xp = replication_pad2d(x, (1, 1, 1, 1))
        h = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                    dtype=x.dtype, name="first_layer")(xp)
        if cond is not None:
            h = h + cond[0]
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="features_0")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = nn.Conv(128, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=x.dtype, name="features_2")(h)
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="features_3")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = SEBlock(128, name="features_5")(h)
        h = nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=x.dtype, name="features_6")(h)
        if cond is not None:
            h = h + cond[1]
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="classifier_0")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = SEBlock(256, name="classifier_2")(h)
        h = ResBlockGNLReLU(512, name="classifier_3")(h)
        h = SEBlock(512, name="classifier_4")(h)
        h = SNConv(self.out_channels, (3, 3), padding="SAME",
                   name="classifier_5")(h)
        return crop2d(h, (8, 8, 8, 8))


@register_model
class V1Discriminator(Discriminator):
    """reference l3v1c.py:115-145."""
    model_name = "waifu2x.v1_discriminator"
    in_channels: int = 3
    out_channels: int = 1
    negative_slope: float = 0.2
    conditional: bool = False
    scale_factor: int = 4

    @nn.compact
    def __call__(self, x, c=None, scale_factor=None, train: bool = False):
        x = modcrop(x, 8)
        cond = None
        if self.conditional:
            c = fit_to_size(x, c)
            cond = ImageToCondition(32, (64, 128), self.scale_factor,
                                    name="to_cond")(c)
        x = normalize(x)
        xp = replication_pad2d(x, (1, 1, 1, 1))
        h = nn.Conv(64, (3, 3), padding="VALID", dtype=x.dtype,
                    name="first_layer")(xp)
        if cond is not None:
            h = h + cond[0]
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="features_0")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=x.dtype, name="features_2")(h)
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="features_3")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = nn.Conv(128, (3, 3), padding="SAME", dtype=x.dtype,
                    name="features_5")(h)
        if cond is not None:
            h = h + cond[1]
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="classifier_0")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = leaky_relu(h, self.negative_slope)
        h = SEBlock(128, name="classifier_2")(h)
        h = SNConv(self.out_channels, (3, 3), padding="SAME",
                   name="classifier_3")(h)
        return crop2d(h, (32, 32, 32, 32))


@register_model
class L3V1Discriminator(Discriminator):
    """reference l3v1c.py:169-181."""
    model_name = "waifu2x.l3v1_discriminator"
    in_channels: int = 3
    out_channels: int = 1
    loss_weights = (0.8, 0.2)

    @nn.compact
    def __call__(self, x, c=None, scale_factor=None, train: bool = False):
        l3 = L3Discriminator(out_channels=self.out_channels, name="l3")(
            x, c, scale_factor)
        v1 = V1Discriminator(out_channels=self.out_channels, name="v1")(
            x, c, scale_factor)
        return l3, v1


@register_model
class L3ConditionalDiscriminator(L3Discriminator):
    model_name = "waifu2x.l3_conditional_discriminator"
    conditional: bool = True


@register_model
class V1ConditionalDiscriminator(V1Discriminator):
    model_name = "waifu2x.v1_conditional_discriminator"
    conditional: bool = True


@register_model
class L3V1ConditionalDiscriminator(Discriminator):
    """reference l3v1c.py:184-202."""
    model_name = "waifu2x.l3v1_conditional_discriminator"
    in_channels: int = 3
    out_channels: int = 1
    scale_factor: int = 4
    loss_weights = (0.8, 0.2)

    @nn.compact
    def __call__(self, x, c=None, scale_factor=None, train: bool = False):
        l3 = L3Discriminator(out_channels=self.out_channels, conditional=True,
                             scale_factor=self.scale_factor, name="l3")(
            x, c, scale_factor)
        v1 = V1Discriminator(out_channels=self.out_channels, conditional=True,
                             scale_factor=self.scale_factor, name="v1")(
            x, c, scale_factor)
        return l3, v1


# --------------------------------------------------------------------------
# U3C: U-net conditional discriminator (reference waifu2x/models/u3c.py)
# --------------------------------------------------------------------------

def to_y(x):
    """Luminance channel (BT.601) appended as a 4th input channel."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def modpad(x, n):
    """Replication-pad bottom/right so H, W are multiples of n."""
    H, W = x.shape[1:3]
    ph = (n - H % n) % n
    pw = (n - W % n) % n
    if ph or pw:
        x = replication_pad2d(x, (0, pw, 0, ph))
    return x


class ResBlockSNLReLU(nn.Module):
    """Spectral-norm residual block, LeakyReLU(0.2) (reference
    disc_utils.py ResBlockSNLReLU)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = replication_pad2d(x, (1, 1, 1, 1))
        h = SNConv(self.out_channels, (3, 3), padding="VALID",
                   name="conv_0")(h)
        h = leaky_relu(h, 0.2)
        h = replication_pad2d(h, (1, 1, 1, 1))
        h = SNConv(self.out_channels, (3, 3), padding="VALID",
                   name="conv_2")(h)
        if x.shape[-1] != self.out_channels:
            x = SNConv(self.out_channels, (1, 1), padding="VALID",
                       name="identity")(x)
        return leaky_relu(h + x, 0.2)


class ImageToConditionPatch8(nn.Module):
    """1/8-resolution patch condition embedding (reference u3c.py:25-56)."""
    embed_dim: int
    outputs: tuple

    @nn.compact
    def __call__(self, x):
        from ...modules.resize import resize
        x = normalize(x)
        x = resize(x, x.shape[1] // 4, x.shape[2] // 4, mode="bilinear",
                   antialias=True)
        h = replication_pad2d(x, (1, 1, 1, 1))
        h = nn.Conv(self.embed_dim, (3, 3), padding="VALID", use_bias=False,
                    dtype=x.dtype, name="features_0")(h)
        h = leaky_relu(h, 0.2)
        # strided GN residual block (stride 2 -> 1/8 total)
        s = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=h.dtype,
                    name="down_conv")(h)
        s = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="down_gn")(
            s.astype(jnp.float32)).astype(h.dtype)
        h = leaky_relu(s, 0.2)
        h = SEBlock(self.embed_dim, name="se")(h)
        h = ResBlockGNLReLU(self.embed_dim, name="res")(h)
        outs = []
        for i, out_c in enumerate(self.outputs):
            z = SNConv(self.embed_dim, (1, 1), padding="VALID",
                       name=f"fc_{i}_0")(h)
            z = leaky_relu(z, 0.2)
            z = SNConv(out_c, (1, 1), padding="VALID", name=f"fc_{i}_2")(z)
            outs.append(z)
        return outs


@register_model
class U3ConditionalDiscriminator(Discriminator):
    """U-net conditional discriminator with two patch heads
    (reference u3c.py:145-240); loss_weights (0.9, 0.1)."""
    model_name = "waifu2x.u3_conditional_discriminator"
    out_channels: int = 1
    loss_weights = (0.9, 0.1)

    @nn.compact
    def __call__(self, x, c=None, scale_factor=None, train: bool = False):
        assert c is not None, "u3c is conditional"
        x = jnp.concatenate([x, to_y(x)], axis=-1)
        c = jnp.concatenate([c, to_y(c)], axis=-1)
        c = fit_to_size(x, c)
        x = modpad(x, 16)
        c = modpad(c, 16)
        cond = ImageToConditionPatch8(64, (256,), name="to_cond")(c)
        x = normalize(x)

        h = replication_pad2d(x, (1, 1, 1, 1))
        h = nn.Conv(32, (3, 3), padding="VALID", use_bias=False,
                    dtype=x.dtype, name="enc1_0")(h)
        h = leaky_relu(h, 0.2)
        h = replication_pad2d(h, (1, 1, 1, 1))
        x1 = leaky_relu(SNConv(64, (4, 4), strides=(2, 2), padding="VALID",
                               name="enc1_2")(h), 0.2)
        h = replication_pad2d(x1, (1, 1, 1, 1))
        x2 = leaky_relu(SNConv(128, (4, 4), strides=(2, 2), padding="VALID",
                               name="enc2")(h), 0.2)
        h = replication_pad2d(x2, (1, 1, 1, 1))
        x3 = leaky_relu(SNConv(256, (4, 4), strides=(2, 2), padding="VALID",
                               name="enc3")(h), 0.2)
        x3 = x3 + cond[0].astype(x3.dtype)
        x3 = ResBlockSNLReLU(256, name="enc4_0")(x3)
        x3 = ResBlockSNLReLU(256, name="enc4_1")(x3)
        z1 = ResBlockSNLReLU(256, name="class1_0")(x3)
        z1 = replication_pad2d(z1, (1, 1, 1, 1))
        z1 = SNConv(self.out_channels, (3, 3), padding="VALID",
                    name="class1_1")(z1)
        x4 = nn.ConvTranspose(128, (2, 2), strides=(2, 2), padding="VALID",
                              use_bias=False, dtype=x3.dtype,
                              name="up1", transpose_kernel=True)(x3)
        x4 = leaky_relu(x4, 0.2)
        x4 = ResBlockSNLReLU(128, name="dec1")(
            x4 + SNConv(128, (1, 1), padding="VALID",
                        name="enc2_proj")(x2))
        x5 = nn.ConvTranspose(64, (2, 2), strides=(2, 2), padding="VALID",
                              use_bias=False, dtype=x4.dtype,
                              name="up2", transpose_kernel=True)(x4)
        x5 = leaky_relu(x5, 0.2)
        x5 = ResBlockSNLReLU(64, name="dec2")(
            x5 + SNConv(64, (1, 1), padding="VALID",
                        name="enc1_proj")(x1))
        z2 = ResBlockSNLReLU(64, name="class2_0")(x5)
        z2 = replication_pad2d(z2, (1, 1, 1, 1))
        z2 = SNConv(self.out_channels, (3, 3), padding="VALID",
                    name="class2_1")(z2)
        if train:
            return crop2d(z2, (8,) * 4), crop2d(z1, (2,) * 4)
        return z2, z1

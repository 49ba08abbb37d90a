"""Convolution helpers, NHWC.

``ConvTranspose2dTorch`` reproduces torch.nn.ConvTranspose2d output-size
semantics (output = (n-1)*stride + kernel - 2*padding) via a dilated
VALID conv — needed for exact parity with reference models such as
waifu2x upconv_7 (reference: waifu2x/models/upconv_7.py:27,
ConvTranspose2d(256, out, 4, 2, 3)).
"""
import jax
import jax.numpy as jnp
import flax.linen as nn


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with torch semantics, NHWC.

    kernel shape: (kh, kw, out_channels, in_channels) pre-flipped so the
    forward is a plain dilated conv (weights converted from torch must be
    spatially flipped and transposed accordingly; see
    nunif_tpu/models/torch_convert.py).
    """
    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 0  # torch-style padding

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)

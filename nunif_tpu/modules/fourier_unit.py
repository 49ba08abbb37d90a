"""Fast-Fourier-Convolution spectral unit (NHWC flax).

Behavioral parity target: reference nunif/modules/fourier_unit.py:10-70
(LaMa/FFC FourierUnit): rfft2 over H,W -> real/imag stacked on channels ->
1x1 conv + norm + relu -> irfft2, optional residual shortcut.  Used by the
iw3 inpaint discriminators.

TPU note: XLA lowers rfft/irfft natively; the 1x1 conv in the frequency
domain is a plain matmul on the MXU.  Computation is fp32 (FFT precision).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .spectral import dft2, idft2


class FourierUnit(nn.Module):
    in_channels: int
    out_channels: int
    residual: bool = True
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        shortcut = x
        dtype = x.dtype
        B, H, W, C = x.shape
        # DFT as matmuls (modules/spectral.py): the axon TPU backend has no
        # XLA FFT, and at these sizes the dense DFT rides the MXU anyway.
        re, im = dft2(x)
        z = jnp.concatenate([re, im], axis=-1)           # (B,H,W,2C)
        z = nn.Conv(self.out_channels * 2, (1, 1), padding="VALID",
                    use_bias=False, name="conv")(z)
        if self.use_norm:
            z = nn.LayerNorm(epsilon=1e-6, name="norm")(z)
        z = nn.relu(z)
        re, im = jnp.split(z, 2, axis=-1)
        z = idft2(re, im).astype(dtype)
        if self.residual:
            if self.in_channels != self.out_channels:
                shortcut = nn.Conv(self.out_channels, (1, 1), padding="VALID",
                                   dtype=dtype, name="identity")(shortcut)
            z = z + shortcut
        return z

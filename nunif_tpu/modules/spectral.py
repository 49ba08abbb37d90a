"""2D DFT as matmuls (MXU-friendly; no XLA FFT dependency).

The axon TPU backend does not implement the XLA FFT custom op, and for
the sizes this framework transforms (loss windows of 8-16 px,
discriminator feature maps <= 128 px) a dense DFT-by-matmul runs on the
MXU at full throughput anyway — two (H,H)/(W,W) matmuls per transform.

dft2/idft2 use "ortho" normalization (1/sqrt(HW) each way), matching the
torch.fft.rfft2(norm="ortho") convention of the reference's FFT ops
(nunif/modules/fft_loss.py, fourier_unit.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _dft_basis(n: int):
    """Returns (cos, sin) (n, n) with angle 2*pi*j*k/n, float32."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def dft2(x):
    """x (B, H, W, C) real -> (re, im) of the 2D DFT, ortho-normalized."""
    B, H, W, C = x.shape
    x = x.astype(jnp.float32)
    cw, sw = map(jnp.asarray, _dft_basis(W))
    ch, sh = map(jnp.asarray, _dft_basis(H))
    # DFT over W: exp(-i a) => re = x@cos, im = -x@sin
    re1 = jnp.einsum("bhwc,wv->bhvc", x, cw, precision="highest")
    im1 = -jnp.einsum("bhwc,wv->bhvc", x, sw, precision="highest")
    # DFT over H on complex (re1 + i*im1)
    re = jnp.einsum("bhvc,hu->buvc", re1, ch, precision="highest") + \
        jnp.einsum("bhvc,hu->buvc", im1, sh, precision="highest")
    im = jnp.einsum("bhvc,hu->buvc", im1, ch, precision="highest") - \
        jnp.einsum("bhvc,hu->buvc", re1, sh, precision="highest")
    scale = 1.0 / float(np.sqrt(H * W))
    return re * scale, im * scale


def idft2(re, im):
    """Inverse of dft2 (real part), ortho-normalized."""
    B, H, W, C = re.shape
    cw, sw = map(jnp.asarray, _dft_basis(W))
    ch, sh = map(jnp.asarray, _dft_basis(H))
    # inverse over H: exp(+i a)
    re1 = jnp.einsum("buvc,hu->bhvc", re, ch, precision="highest") - \
        jnp.einsum("buvc,hu->bhvc", im, sh, precision="highest")
    im1 = jnp.einsum("buvc,hu->bhvc", im, ch, precision="highest") + \
        jnp.einsum("buvc,hu->bhvc", re, sh, precision="highest")
    # inverse over W, real part only
    out = jnp.einsum("bhvc,wv->bhwc", re1, cw, precision="highest") - \
        jnp.einsum("bhvc,wv->bhwc", im1, sw, precision="highest")
    scale = 1.0 / float(np.sqrt(H * W))
    return out * scale

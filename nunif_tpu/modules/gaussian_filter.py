"""Gaussian blur (NHWC), torchvision-compatible kernel.

Behavioral parity target: reference nunif/modules/gaussian_filter.py —
sigma default kernel_size*0.15+0.35, separable depthwise conv with
replication padding.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .pad import replication_pad2d


def get_gaussian_kernel1d(kernel_size: int, sigma=None) -> np.ndarray:
    if kernel_size == 1:
        return np.ones((1,), np.float32)
    if sigma is None:
        sigma = kernel_size * 0.15 + 0.35
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def get_gaussian_kernel2d(kernel_size, sigma=None) -> np.ndarray:
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    ky = get_gaussian_kernel1d(kernel_size[0], sigma)
    kx = get_gaussian_kernel1d(kernel_size[1], sigma)
    return np.outer(ky, kx).astype(np.float32)


def _depthwise(x, kernel2d):
    C = x.shape[-1]
    kh, kw = kernel2d.shape
    w = jnp.asarray(kernel2d, x.dtype)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, C))  # HWIO with feature_group_count=C
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def gaussian_blur(x, kernel_size, sigma=None):
    """x (B,H,W,C), replication-padded 'same' gaussian blur."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    k = get_gaussian_kernel2d(kernel_size, sigma)
    ph, pw = kernel_size[0] // 2, kernel_size[1] // 2
    x = replication_pad2d(x, (pw, pw, ph, ph))
    return _depthwise(x, k)


class GaussianFilter2d:
    """Callable matching the reference module's (in_channels, kernel_size)
    construction; stateless in JAX."""

    def __init__(self, in_channels, kernel_size, padding=None, sigma=None):
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.padding = padding

    def __call__(self, x):
        if self.padding is None:
            k = get_gaussian_kernel2d(self.kernel_size, self.sigma)
            return _depthwise(x, k)
        return gaussian_blur(x, self.kernel_size, self.sigma)

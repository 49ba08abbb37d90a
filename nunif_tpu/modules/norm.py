"""Normalization layers (reference: nunif/modules/norm.py:7-108)."""
import jax
import jax.numpy as jnp
import flax.linen as nn


class LayerNormNoBias(nn.Module):
    """LayerNorm over the channel (last) axis, scale only, no bias."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, use_bias=False)(x)


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(x.dtype)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)

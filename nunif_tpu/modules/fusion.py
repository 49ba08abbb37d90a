"""Learned fusion primitives (flax).

Behavioral parity target: reference nunif/modules/fusion.py — Lerp with a
learned offset around 0.5, AdaptiveWeight softmax weights, and
AdaptiveWeightedAdd.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Lerp(nn.Module):
    weight_shape: tuple = (1,)

    @nn.compact
    def __call__(self, input, end):
        w = self.param("weight", nn.initializers.zeros, self.weight_shape)
        t = (0.5 + w).astype(input.dtype)
        return input + t * (end - input)


class AdaptiveWeightedAdd(nn.Module):
    n: int = 2

    @nn.compact
    def __call__(self, *inputs):
        assert len(inputs) == self.n
        w = self.param("weight", nn.initializers.ones, (self.n,))
        w = jax.nn.softmax(w.astype(jnp.float32)).astype(inputs[0].dtype)
        return sum(x * w[i] for i, x in enumerate(inputs))

"""Functional PRNG management.

TPU-native replacement for the reference's global seeding
(reference: nunif/initializer.py:31-39).  JAX has no global RNG; we thread
explicit keys.  ``RNG`` is a tiny stateful convenience wrapper for host-side
code (data pipelines, training loops) that splits a root key on demand;
everything inside jit takes explicit keys.
"""
import threading

import jax
import numpy as np


class RNG:
    """Thread-safe splitting PRNG-key source for host-side orchestration."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()

    def next(self) -> jax.Array:
        with self._lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        with self._lock:
            keys = jax.random.split(self._key, n + 1)
            self._key = keys[0]
        return keys[1:]

    def numpy(self) -> np.random.Generator:
        """Derive a numpy Generator (for host-side data augmentation)."""
        sub = self.next()
        return np.random.default_rng(np.asarray(jax.random.key_data(sub))[-1].item())


_global_rng = RNG(0)


def set_seed(seed: int) -> RNG:
    """Reset the process-level RNG source. Returns it for chaining."""
    global _global_rng
    _global_rng = RNG(seed)
    np.random.seed(seed & 0xFFFFFFFF)
    return _global_rng


def new_key() -> jax.Array:
    """Split a fresh key off the process-level RNG source."""
    return _global_rng.next()

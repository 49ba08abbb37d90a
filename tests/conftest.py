"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
overriding the JAX_PLATFORMS env var — so we must override it back via
config.update, not just the environment.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()

"""Device & platform management.

TPU-native replacement for the reference's device-id bookkeeping
(reference: nunif/device.py:12-71).  On TPU there is no per-call device
placement: JAX owns the devices and computations are placed by sharding.
This module only exposes discovery/introspection; placement is the job of
``nunif_tpu.parallel`` (mesh + shardings).
"""
import functools

import jax


def platform() -> str:
    """Return the default JAX backend platform ("tpu", "cpu", "gpu")."""
    return jax.default_backend()


def device_count() -> int:
    return jax.device_count()


def local_devices():
    return jax.local_devices()


def default_device():
    return jax.local_devices()[0]


@functools.lru_cache(maxsize=None)
def device_info() -> dict:
    """Summarize the device fleet (for logging / diagnostics)."""
    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    return {
        "platform": platform(),
        "device_count": len(devs),
        "local_device_count": jax.local_device_count(),
        "process_count": jax.process_count(),
        "device_kinds": kinds,
    }


def is_tpu() -> bool:
    return platform() in ("tpu", "axon")

from .device import (
    platform, device_count, local_devices, default_device, device_info,
)
from .rng import RNG, set_seed, new_key
from .logger import logger
from .dtypes import Policy, DEFAULT_POLICY, BF16_POLICY, FP32_POLICY

__all__ = [
    "platform", "device_count", "local_devices", "default_device", "device_info",
    "RNG", "set_seed", "new_key",
    "logger",
    "Policy", "DEFAULT_POLICY", "BF16_POLICY", "FP32_POLICY",
]

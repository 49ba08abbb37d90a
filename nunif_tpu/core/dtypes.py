"""Mixed-precision policy.

TPU-native replacement for torch autocast/GradScaler
(reference: nunif/device.py:58-71, nunif/training/trainer.py:62-64).
bfloat16 has the same exponent range as fp32, so no loss scaling is needed —
the policy is just: params fp32, compute bf16, blend/accumulate fp32.
"""
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


BF16_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
DEFAULT_POLICY = BF16_POLICY

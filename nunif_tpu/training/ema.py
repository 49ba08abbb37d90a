"""EMA of model params (reference: nunif/training/trainer.py:67-69
AveragedModel with EMA avg_fn)."""
import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree_util.tree_map(jnp.array, params)


def ema_update(ema_params, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)

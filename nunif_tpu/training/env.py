"""Per-batch step logic — functional Env (reference: nunif/training/env.py).

The reference's BaseEnv owns autocast/GradScaler/NaN-guard/grad-accumulation
inside a mutable train loop.  Here the whole step is ONE jitted pure function
over an explicit TrainState:

  * grad accumulation: ``lax.scan`` over microbatches inside the step
    (reference --backward-step, env.py:168-206)
  * NaN guard: non-finite loss skips the update via ``lax.cond`` and bumps
    ``nan_count`` (reference env.py:185-192 raise-or-tolerate<=100)
  * mixed precision: params fp32, compute bf16; no GradScaler needed on TPU
  * EMA params updated in-step (reference trainer.py:67-69)

Apps provide ``loss_fn(params, batch, rng) -> (loss, aux_dict)``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .ema import ema_update


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    nan_count: jnp.ndarray
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema=False):
        # private copy: the jitted step donates the state, which DELETES
        # its input buffers — without the copy, the caller's params tree
        # (often reused to build another Trainer / renderer) would die on
        # the first step
        params = jax.tree_util.tree_map(jnp.array, params)
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            nan_count=jnp.zeros((), jnp.int32),
            ema_params=jax.tree_util.tree_map(jnp.array, params) if use_ema else None,
        )


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    *, accum_steps: int = 1, ema_decay: Optional[float] = None,
                    donate: bool = True, steps_per_dispatch: int = 1):
    """Build the jitted train step.

    loss_fn(params, batch, rng) -> (scalar loss, aux dict)
    batch: pytree whose leaves have leading dim = accum_steps * microbatch
           when accum_steps > 1.
    returns step(state, batch, rng) -> (state, metrics)

    steps_per_dispatch > 1: returns step(state, batches, rng) where each
    ``batches`` leaf has an extra leading dim of that length, and the
    whole group of optimizer steps runs as ONE device program
    (``lax.scan`` over the per-batch step).  This is the training
    counterpart of the renderer's device-side frame loop: on hosts where
    each dispatch pays a long RPC/tunnel latency the per-step cost is
    dominated by dispatch, not compute (measured ~0.6 s/dispatch on the
    build harness — a 256-step epoch of a small SR model was 97%%
    dispatch gap).  Metrics come back stacked with shape
    (steps_per_dispatch,) so per-batch loss feedback (hard-example
    mining) still sees every step.  The reference has no analogue: torch
    eagerly enqueues ops so host latency overlaps compute
    (reference nunif/training/env.py:168-206); under XLA the same
    overlap must be expressed as a scanned program."""

    def grads_of(params, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        return loss, aux, grads

    def accumulate(params, batch, rng):
        if accum_steps == 1:
            return grads_of(params, batch, rng)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch)
        rngs = jax.random.split(rng, accum_steps)

        def body(carry, inp):
            loss_acc, grads_acc = carry
            mb, r = inp
            loss, aux, grads = grads_of(params, mb, r)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (loss_acc + loss, grads_acc), aux

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss_sum, grads), aux = jax.lax.scan(
            body, (jnp.zeros(()), zero_grads), (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        aux = jax.tree_util.tree_map(lambda a: a[-1], aux)
        return loss_sum / accum_steps, aux, grads

    def step_impl(state: TrainState, batch, rng):
        loss, aux, grads = accumulate(state.params, batch, rng)
        finite = jnp.isfinite(loss)

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return new_params, new_opt

        def skip_update(_):
            return state.params, state.opt_state

        new_params, new_opt = jax.lax.cond(finite, do_update, skip_update, None)
        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay is not None:
            new_ema = jax.lax.cond(
                finite,
                lambda _: ema_update(state.ema_params, new_params, ema_decay),
                lambda _: state.ema_params, None)
        new_state = state.replace(
            params=new_params, opt_state=new_opt,
            step=state.step + 1,
            nan_count=state.nan_count + jnp.where(finite, 0, 1),
            ema_params=new_ema)
        metrics = {"loss": jnp.where(finite, loss, 0.0), "finite": finite}
        metrics.update(aux)
        return new_state, metrics

    donate_args = (0,) if donate else ()
    if steps_per_dispatch <= 1:
        return partial(jax.jit, donate_argnums=donate_args)(step_impl)

    @partial(jax.jit, donate_argnums=donate_args)
    def multi_step(state: TrainState, batches, rng):
        rngs = jax.random.split(rng, steps_per_dispatch)

        def body(st, inp):
            b, r = inp
            return step_impl(st, b, r)

        return jax.lax.scan(body, state, (batches, rngs))

    return multi_step


def make_eval_step(metric_fn: Callable):
    """metric_fn(params, batch) -> dict of scalars; jitted."""
    @jax.jit
    def step(params, batch):
        return metric_fn(params, batch)
    return step


def calculate_adaptive_weight(loss_a_grad_norm, loss_b_grad_norm,
                              min_value=0.01, max_value=10.0):
    """Taming-transformers style two-loss balance
    (reference: nunif/training/env.py:100-127): weight for loss_b so its
    gradient magnitude matches loss_a's."""
    w = loss_a_grad_norm / (loss_b_grad_norm + 1e-8)
    return jnp.clip(w, min_value, max_value)


def grad_norm_wrt(loss_fn, params, *args):
    """Global L2 norm of d loss / d params (for adaptive GAN weighting)."""
    grads = jax.grad(loss_fn)(params, *args)
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))

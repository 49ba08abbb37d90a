"""GAN training steps — functional G/D updates with the reference's
stability features.

Behavioral parity target: reference waifu2x/training/trainer.py:374-545 +
nunif/training/env.py:100-128 + nunif/modules/gan_loss.py:
  * adaptive discriminator weight from the ratio of recon/gen grad norms
    (taming-transformers style), EMA-smoothed, clamped
  * generator warmup (D trains, G uses recon loss only, for N steps)
  * hinge / bce / softplus D losses; multi-headed discriminators weighted
    by ``loss_weights``
  * lazy R1 gradient penalty every ``r1_interval`` steps

JAX re-design: the reference computes grad norms w.r.t. the generator's
last layer via a second autograd pass and mixes losses before one backward;
here the recon and adversarial grads are computed as two jax.grad passes
and combined linearly with the (stop-gradient) adaptive weight — the same
update, expressed functionally.  Everything, including the lax.cond'd R1
pass, is one jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..modules import losses as L


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g_params: dict
    g_opt: optax.OptState
    d_params: dict
    d_opt: optax.OptState
    disc_weight_ema: jnp.ndarray  # smoothed adaptive weight
    g_ema_params: Optional[dict] = None


@dataclasses.dataclass
class GANConfig:
    gan_loss: str = "hinge"          # hinge | bce | softplus
    discriminator_weight: float = 1.0
    adaptive_weight: bool = True
    adaptive_ema_decay: float = 0.98
    adaptive_min: float = 1e-4
    adaptive_max: float = 10.0
    generator_start_step: int = 0    # G warmup: adversarial term off before
    r1_gamma: float = 10.0
    r1_interval: int = 16
    ema_decay: float = 0.0           # >0 enables G param EMA


def _d_loss_fns(kind):
    if kind == "hinge":
        return L.gan_hinge_loss_d, L.gan_hinge_loss_g
    if kind == "mask_hinge":
        # logits come paired with an aligned hole-mask grid; only masked
        # patches count (reference GANMaskHingeLoss)
        def d(real, fake):
            real_logits, mask = real
            fake_logits, _ = fake
            return L.gan_mask_hinge_loss_d(real_logits, fake_logits, mask)

        def g(fake):
            fake_logits, mask = fake
            return L.gan_mask_hinge_loss_g(fake_logits, mask)
        return d, g
    if kind == "bce":
        def d(real, fake):
            return L.gan_bce_loss(real, True) + L.gan_bce_loss(fake, False)

        def g(fake):
            return L.gan_bce_loss(fake, True)
        return d, g
    if kind == "softplus":
        return L.gan_softplus_loss_d, L.gan_softplus_loss_g
    raise ValueError(kind)


def _multi(logits):
    return logits if isinstance(logits, (tuple, list)) else (logits,)


def make_gan_train_step(g_apply: Callable, d_apply: Callable,
                        recon_loss_fn: Callable,
                        g_tx: optax.GradientTransformation,
                        d_tx: optax.GradientTransformation,
                        cfg: GANConfig,
                        d_loss_weights=(1.0,),
                        last_layer_path: Optional[tuple] = None):
    """Build the jitted GAN step.

    g_apply(params, batch) -> fake image (NHWC)
    d_apply(params, image, cond) -> logits or tuple of logits
    recon_loss_fn(fake, real) -> scalar
    batch: dict with "x" (input), "y" (target), optional "cond".
    last_layer_path: key path into g_params whose grad norm drives the
    adaptive weight (None = full-grad norms).
    """
    d_loss_fn, g_gan_loss_fn = _d_loss_fns(cfg.gan_loss)

    def _norm_at(grads):
        if last_layer_path is not None:
            leaf = grads
            for k in last_layer_path:
                leaf = leaf[k]
            return jnp.linalg.norm(leaf.astype(jnp.float32))
        return optax.global_norm(grads)

    mask_mode = cfg.gan_loss == "mask_hinge"

    def _d_call(d_params, img, batch):
        if mask_mode:
            # single head of (logits, mask-grid); d_apply takes the mask
            return (d_apply(d_params, img, batch.get("cond"),
                            batch["mask"]),)
        return _multi(d_apply(d_params, img, batch.get("cond")))

    def g_losses(g_params, d_params, batch):
        fake = g_apply(g_params, batch)
        recon = recon_loss_fn(fake, batch["y"])
        logits = _d_call(d_params, fake, batch)
        gen = sum(w * g_gan_loss_fn(lg)
                  for w, lg in zip(d_loss_weights, logits))
        return recon, gen, fake

    def init(g_params, d_params, use_ema=None):
        use_ema = cfg.ema_decay > 0 if use_ema is None else use_ema
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, g_opt=g_tx.init(g_params),
            d_params=d_params, d_opt=d_tx.init(d_params),
            disc_weight_ema=jnp.asarray(1.0, jnp.float32),
            g_ema_params=jax.tree.map(jnp.copy, g_params) if use_ema else None)

    @jax.jit
    def step(state: GANTrainState, batch):
        # ---- generator ----
        def recon_only(p):
            recon, gen, fake = g_losses(p, state.d_params, batch)
            return recon, (gen, fake)

        def gen_only(p):
            recon, gen, fake = g_losses(p, state.d_params, batch)
            return gen, (recon, fake)

        (recon, (gen, fake)), g_recon_grads = jax.value_and_grad(
            recon_only, has_aux=True)(state.g_params)
        _, g_gen_grads = jax.value_and_grad(
            gen_only, has_aux=True)(state.g_params)

        # adaptive weight: |∇recon| / |∇gen| at the probe layer
        nr = _norm_at(g_recon_grads)
        ng = _norm_at(g_gen_grads)
        raw_w = jnp.clip(nr / (ng + 1e-8), cfg.adaptive_min, cfg.adaptive_max)
        w_ema = (state.disc_weight_ema * cfg.adaptive_ema_decay
                 + raw_w * (1 - cfg.adaptive_ema_decay))
        weight = (w_ema if cfg.adaptive_weight else 1.0) * cfg.discriminator_weight
        warmed = state.step >= cfg.generator_start_step
        weight = jnp.where(warmed, weight, 0.0)

        g_grads = jax.tree.map(lambda a, b: a + weight * b,
                               g_recon_grads, g_gen_grads)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- discriminator ----
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss(p):
            real_logits = _d_call(p, batch["y"], batch)
            fake_logits = _d_call(p, fake_sg, batch)
            loss = sum(w * d_loss_fn(r, f) for w, r, f in
                       zip(d_loss_weights, real_logits, fake_logits))
            return loss

        d_loss_v, d_grads = jax.value_and_grad(d_loss)(state.d_params)

        def with_r1(_):
            def r1(p):
                def d_sum(img):
                    logits = _d_call(p, img, batch)
                    if mask_mode:
                        logits = [lg for lg, _m in logits]
                    return sum(jnp.sum(lg) for lg in logits)
                g_img = jax.grad(d_sum)(batch["y"])
                return (cfg.r1_gamma / 2) * jnp.mean(
                    jnp.sum(g_img.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
            r1_grads = jax.grad(r1)(state.d_params)
            return jax.tree.map(lambda a, b: a + cfg.r1_interval * b,
                                d_grads, r1_grads)

        if cfg.r1_gamma > 0:
            d_grads = jax.lax.cond(
                state.step % cfg.r1_interval == 0, with_r1,
                lambda _: d_grads, None)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        ema = state.g_ema_params
        if ema is not None:
            ema = jax.tree.map(
                lambda e, p: e * cfg.ema_decay + p * (1 - cfg.ema_decay),
                ema, g_params)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params, g_opt=g_opt,
            d_params=d_params, d_opt=d_opt, disc_weight_ema=w_ema,
            g_ema_params=ema)
        metrics = {"recon": recon, "gen": gen, "d": d_loss_v,
                   "disc_weight": weight}
        return new_state, metrics

    return init, step

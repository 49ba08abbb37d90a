"""Inpaint training addon (image + video models, optional masked GAN).

Behavioral parity target: reference iw3/training/inpaint/trainer.py —
  * InpaintEnv recon stack: ClampLoss(L1) + windowed DCT; the video model
    adds a temporal gradient loss (:34-39)
  * GAN mode with the masked hinge loss, FFC / L3-conditional
    discriminators, adaptive weight + generator warmup (:101-305)
  * masked-composite forward: the generator only learns inside the hole

JAX re-design: the per-batch step is a jitted function built from
training.gan.make_gan_train_step (mask_hinge mode) or a plain jitted
recon step via the generic Trainer.
"""
from __future__ import annotations

import os

import numpy as np

from ....core.logger import logger
from ....models import create_model
from ....modules import losses as L
from ....training.trainer import Trainer, TrainerConfig
from ... import models as _models  # noqa: F401 (register inpaint models)
from .dataset import InpaintDataset, VideoInpaintDataset


def temporal_gradient_loss(x, y):
    """reference :34-39: L1 of adjacent-frame differences."""
    import jax.numpy as jnp
    return jnp.mean(jnp.abs((x[:-1] - x[1:]) - (y[:-1] - y[1:])))


def make_recon_loss(video: bool):
    import jax.numpy as jnp
    dct = L.dct_loss(window_size=8, clamp=True, yrgb=False)

    def loss_fn(z, y):
        loss = L.clamp_loss_of(L.l1_loss)(z, y) + dct(z, y)
        if video:
            loss = loss + temporal_gradient_loss(z, y) * 2.0
        return loss
    return loss_fn


def _mask_inputs(batch):
    """Generator input: hole-masked image + mask (matches the inference
    preprocess: x * (1-mask))."""
    x = batch["y"] * (1.0 - batch["mask"])
    return x, batch["mask"]


def train_main(args):
    import jax
    import jax.numpy as jnp
    import optax

    video = args.arch == "inpaint.light_video_inpaint_v1"
    model = create_model(args.arch)
    size = args.size
    seq = 12 if video else args.batch_size
    init_shape = (seq, size, size, 3)
    params = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros(init_shape),
        mask=jnp.zeros(init_shape[:-1] + (1,)), train=True)["params"]
    recon = make_recon_loss(video)

    if args.discriminator:
        from ....training.gan import make_gan_train_step, GANConfig
        from ...models.discriminator import (
            FFCDiscriminator, InpaintL3ConditionalDiscriminator,
        )
        disc_cls = {"ffc": FFCDiscriminator,
                    "l3c": InpaintL3ConditionalDiscriminator}[args.discriminator]
        disc = disc_cls()
        d_params = disc.init(
            jax.random.PRNGKey(args.seed + 1), jnp.zeros(init_shape),
            c=jnp.zeros(init_shape), mask=jnp.zeros(init_shape[:-1] + (1,)),
            train=True)["params"]

        def g_apply(p, batch):
            x, mask = _mask_inputs(batch)
            return model.apply_fn(p, x, mask=mask, train=True)

        def d_apply(p, img, cond, mask):
            return disc.apply_fn(p, img, c=cond, mask=mask, train=True)

        cfg = GANConfig(gan_loss="mask_hinge",
                        discriminator_weight=args.discriminator_weight,
                        generator_start_step=args.generator_start_step,
                        r1_gamma=0.0,
                        ema_decay=args.ema_decay or 0.0)
        tx = optax.adam(args.learning_rate)
        d_tx = optax.adam(args.learning_rate)
        init, step = make_gan_train_step(
            g_apply, d_apply, recon, tx, d_tx, cfg)
        state = init(params, d_params)
        rng = np.random.default_rng(args.seed)
        ds_cls = VideoInpaintDataset if video else InpaintDataset
        ds = ds_cls(os.path.join(args.data_dir, "train"), size=size,
                    num_samples=args.num_samples, seed=args.seed)
        os.makedirs(args.model_dir, exist_ok=True)
        for epoch in range(args.max_epoch):
            metrics = None
            for batch in ds.batches(args.batch_size):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                batch["cond"] = batch["y"] * (1.0 - batch["mask"])
                state, metrics = step(state, batch)
            logger.info("inpaint GAN epoch %d: %s", epoch,
                        {k: float(v) for k, v in (metrics or {}).items()})
            from ....models.io import save_model
            save_model(model, state.g_params,
                       os.path.join(args.model_dir,
                                    args.arch.replace(".", "_") + ".nztm"))
        return 0

    # PSNR (recon-only) mode through the generic Trainer
    def loss_fn(params, batch, rng):
        x, mask = _mask_inputs(batch)
        z = model.apply_fn(params, x, mask=mask, train=True)
        return recon(z, batch["y"]), {}

    def eval_fn(params, batch):
        x, mask = _mask_inputs(batch)
        z = model.apply_fn(params, x, mask=mask, train=False)
        return L.psnr(z, batch["y"])

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay,
        checkpoint_name=args.arch.replace(".", "_"))
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    ds_cls = VideoInpaintDataset if video else InpaintDataset
    train_ds = ds_cls(os.path.join(args.data_dir, "train"), size=size,
                      num_samples=args.num_samples, seed=args.seed)
    eval_ds = ds_cls(os.path.join(args.data_dir, "eval"), size=size,
                     num_samples=max(args.num_samples // 10, args.batch_size),
                     seed=args.seed + 1, training=False)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("inpaint", parents=[default_parser],
                              help="iw3 inpainting net training")
    p.add_argument("--arch", default="inpaint.light_inpaint_v1",
                   choices=["inpaint.light_inpaint_v1",
                            "inpaint.light_video_inpaint_v1"])
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--discriminator", default=None,
                   choices=[None, "ffc", "l3c"])
    p.add_argument("--discriminator-weight", type=float, default=1.0)
    p.add_argument("--generator-start-step", type=int, default=0)
    p.set_defaults(handler=train_main)
    return p

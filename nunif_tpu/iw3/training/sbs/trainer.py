"""SBS warp-net training addon (row_flow_v3 / MLBW).

Behavioral parity target: reference iw3/training/sbs/trainer.py:21-226 —
windowed-DCT warp losses with disocclusion-mask downweighting + delta
monotonicity penalty; the model's training forward is expressed
functionally: delta from the net, warp applied by the framework's
backward_warp_delta (identical to the inference path, differentiable).
"""
from __future__ import annotations

import os

import numpy as np

from ....core.logger import logger
from ....models import create_model
from ....modules import losses as L
from ....training.trainer import Trainer, TrainerConfig
from ...backward_warp import make_input_tensor, backward_warp_delta
from ....modules.pad import crop2d
from .dataset import SBSDataset, synthesize_quads


def delta_penalty(warp_points):
    """Warp points must be monotonically increasing along x
    (reference trainer.py:21-28).  warp_points: (B, H, W)."""
    import jax.numpy as jnp
    penalty = 0.0
    for i in range(1, 3):
        penalty = penalty + jnp.mean(
            jnp.maximum(warp_points[:, :, :-i] - warp_points[:, :, i:], 0.0))
    return penalty / 3.0


def make_sbs_loss(model, model_offset: int, mask_weight: float = 0.75):
    """Functional RowFlow/MLBW loss (reference RowFlowV3Loss/MLBWLoss)."""
    import jax.numpy as jnp
    from ....modules.pool import avg_pool2d

    dct24 = L.dct_loss(window_size=24, clamp=True, yrgb=False)
    dct4 = L.dct_loss(window_size=4, clamp=True, yrgb=False)
    is_mlbw = model.model_name == "sbs.mlbw"

    def loss_fn(params, batch, rng):
        rgb = batch["rgb"]
        depth = batch["depth"][..., None]
        B, H, W, _ = rgb.shape
        x = make_input_tensor(None, depth, batch["divergence"][0],
                              batch["convergence"], image_width=max(H, W))
        out = model.apply_fn(params, x, train=True)
        delta_scale = 1.0 / (W // 2 - 1)
        x_index = jnp.arange(W, dtype=jnp.float32).reshape(1, 1, W)
        if is_mlbw:
            delta, layer_weight = out[0], out[1]
            z = jnp.zeros_like(rgb)
            wp = 0.0
            for i in range(model.num_layers):
                z = z + (backward_warp_delta(rgb, delta[..., i], delta_scale)
                         * layer_weight[..., i:i + 1])
                wp = wp + (x_index + delta[..., i]) * layer_weight[..., i]
        else:
            delta = out[..., 0]
            z = backward_warp_delta(rgb, delta, delta_scale)
            wp = x_index + delta
        off = model_offset
        z = crop2d(z, (off,) * 4)

        y = batch["y"]
        mask = batch["mask"]
        if mask_weight > 0:
            m = 1.0 - jnp.clip(mask + avg_pool2d(mask, 3), 0, 1) * mask_weight
            z = z * m
            y = y * m
        loss = (dct24(z, y) + dct4(z, y) + L.dct_loss(clamp=True, yrgb=False)(z, y)) * 0.3
        return loss + delta_penalty(wp), {}

    def eval_fn(params, batch):
        loss, _ = loss_fn(params, batch, None)
        return loss

    return loss_fn, eval_fn


def train_main(args):
    import jax
    model = create_model(args.arch)
    tile = args.size
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, tile, tile, 3))
    loss_fn, eval_fn = make_sbs_loss(model, model.i2i_offset,
                                     mask_weight=args.mask_weight)
    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay,
        checkpoint_name=args.arch.replace(".", "_"))
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = SBSDataset(os.path.join(args.data_dir, "train"), tile,
                          model.i2i_offset, num_samples=args.num_samples,
                          seed=args.seed)
    eval_ds = SBSDataset(os.path.join(args.data_dir, "eval"), tile,
                         model.i2i_offset,
                         num_samples=max(args.num_samples // 10,
                                         args.batch_size),
                         training=False)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def create_training_data_main(args):
    n = 0
    for split, n_img in (("train", args.n_train), ("eval", args.n_eval)):
        n += synthesize_quads(
            args.dataset_dir if args.dataset_dir != "synthetic" else None,
            os.path.join(args.data_dir, split),
            n_per_image=args.n_per_image, size=args.size,
            divergence=args.divergence, convergence=args.convergence,
            seed=71 if split == "train" else 137)
    logger.info("sbs: synthesized %d quads", n)
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("sbs", parents=[default_parser],
                              help="iw3 stereo warp net training")
    p.add_argument("--arch", default="sbs.row_flow_v3",
                   choices=["sbs.row_flow_v3", "sbs.row_flow_v2",
                            "sbs.mlbw_l2", "sbs.mlbw_l4"])
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--mask-weight", type=float, default=0.75)
    p.set_defaults(handler=train_main)
    return p


def register_create_training_data(subparsers, default_parser):
    p = subparsers.add_parser("sbs", parents=[default_parser],
                              help="synthesize sbs warp training quads")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--n-train", type=int, default=8)
    p.add_argument("--n-eval", type=int, default=2)
    p.add_argument("--n-per-image", type=int, default=2)
    p.add_argument("--divergence", type=float, default=2.0)
    p.add_argument("--convergence", type=float, default=0.5)
    p.set_defaults(handler=create_training_data_main)
    return p

"""DepthAA training addon.

Behavioral parity target: reference iw3/training/depth_aa/trainer.py —
the anti-aliasing net learns (aliased depth -> smooth depth); losses
dct (weighted windowed DCT) / l1 / lbp, Y-PSNR eval.  Training pairs are
synthesized: a smooth depth map is nearest-downscaled+upscaled to create
the aliased input (the reference builds these from depth-model outputs).
"""
from __future__ import annotations

import os

import numpy as np

from ...models import create_model
from ...modules import losses as L
from ...training.trainer import Trainer, TrainerConfig


def make_criterion(kind: str):
    if kind == "dct":
        d8 = L.dct_loss(window_size=8, clamp=False, yrgb=False)
        d4 = L.dct_loss(window_size=4, clamp=False, yrgb=False)

        def fn(x, y):
            return d8(x, y) * 0.5 + d4(x, y) * 0.5
        return fn
    if kind == "l1":
        return L.l1_loss
    if kind == "lbp":
        return L.lbp_loss(in_channels=1, out_channels=64, kernel_size=3)
    raise ValueError(kind)


def _synth_depth(rng, size):
    """Smooth synthetic depth: gradients + radial blobs (like sbs)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    d = rng.uniform() * xx + rng.uniform() * yy
    for _ in range(rng.integers(1, 5)):
        cx, cy = rng.uniform(), rng.uniform()
        r = rng.uniform(0.1, 0.4)
        d += np.clip(r - np.hypot(xx - cx, yy - cy), 0, None) * 2
    d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
    return d[..., None].astype(np.float32)


def _alias(d, factor):
    """Nearest down+up: the staircase artifact DepthAA removes."""
    small = d[::factor, ::factor]
    return np.repeat(np.repeat(small, factor, 0), factor, 1)[:d.shape[0],
                                                             :d.shape[1]]


class DepthAADataset:
    def __init__(self, size=128, num_samples=500, seed=71):
        self.size = size
        self.num_samples = num_samples
        self.seed = seed

    def batches(self, batch_size):
        rng = np.random.default_rng(self.seed)
        for i in range(0, self.num_samples, batch_size):
            xs, ys = [], []
            for _ in range(batch_size):
                y = _synth_depth(rng, self.size)
                x = _alias(y, int(rng.choice([2, 3, 4])))
                xs.append(x)
                ys.append(y)
            yield {"x": np.stack(xs), "y": np.stack(ys)}


def train_main(args):
    import jax
    model = create_model("iw3.depth_aa")
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, args.size, args.size, 1))
    criterion = make_criterion(args.loss)

    def loss_fn(params, batch, rng):
        z = model.apply_fn(params, batch["x"], train=True)
        return criterion(z, batch["y"]), {}

    def eval_fn(params, batch):
        z = model.apply_fn(params, batch["x"], train=False)
        return L.psnr(z, batch["y"])

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay, checkpoint_name="iw3_depth_aa")
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = DepthAADataset(size=args.size, num_samples=args.num_samples,
                              seed=args.seed)
    eval_ds = DepthAADataset(size=args.size,
                             num_samples=max(args.num_samples // 10,
                                             args.batch_size),
                             seed=args.seed + 1)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("depth_aa", parents=[default_parser],
                              help="iw3 depth anti-aliasing net training")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--loss", default="dct", choices=["dct", "l1", "lbp"])
    p.set_defaults(handler=train_main)
    return p

"""DA3-mono disparity-conversion training addon + benchmark.

Behavioral parity target: reference iw3/training/da3mono/trainer.py —
DA3MonoDisparity trained with min-max-normalized MSE (SSI loss rejected
per the reference's note :23-31), NormalizedPSNR eval; plus a small
benchmark CLI (reference iw3/training/da3mono/benchmark.py).

Training pairs: metric-style depth maps (synthetic or exported 16-bit
PNGs via --data-dir) and target disparities 1/(depth + gt_shift) with a
random per-sample shift — the net must recover the shift from the depth
statistics.
"""
from __future__ import annotations

import os

import numpy as np

from ...models import create_model
from ...training.trainer import Trainer, TrainerConfig


def _normalize(x):
    import jax.numpy as jnp
    mn = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    mx = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return (x - mn) / jnp.maximum(mx - mn, 1e-6)


def normalized_mse(x, y):
    import jax.numpy as jnp
    return jnp.mean((_normalize(x) - _normalize(y)) ** 2)


def normalized_psnr(x, y):
    import jax.numpy as jnp
    mse = jnp.mean((_normalize(x) - _normalize(y)) ** 2)
    return -10.0 * jnp.log10(1.0 / (mse + 1e-6))


def _synth_depth(rng, size, max_depth=40.0):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    d = rng.uniform() * xx + rng.uniform() * yy
    for _ in range(rng.integers(1, 5)):
        cx, cy = rng.uniform(), rng.uniform()
        r = rng.uniform(0.1, 0.4)
        d += np.clip(r - np.hypot(xx - cx, yy - cy), 0, None) * 2
    d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
    depth = (d * rng.uniform(2.0, max_depth))[..., None]
    if rng.uniform() < 0.5:  # sky region at max depth
        depth[: size // 4] = depth.max()
    return depth.astype(np.float32)


class DA3MonoDataset:
    def __init__(self, size=128, num_samples=500, seed=71):
        self.size = size
        self.num_samples = num_samples
        self.seed = seed

    def batches(self, batch_size):
        rng = np.random.default_rng(self.seed)
        for i in range(0, self.num_samples, batch_size):
            xs, ys = [], []
            for _ in range(batch_size):
                depth = _synth_depth(rng, self.size)
                shift = rng.uniform(0.05, 0.5)
                ys.append(1.0 / (depth + shift))
                xs.append(depth)
            yield {"x": np.stack(xs), "y": np.stack(ys)}


def train_main(args):
    import jax
    model = create_model("iw3.da3mono_disparity")
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, args.size, args.size, 1))

    def loss_fn(params, batch, rng):
        z = model.apply_fn(params, batch["x"], train=True)
        return normalized_mse(z, batch["y"]), {}

    def eval_fn(params, batch):
        z = model.apply_fn(params, batch["x"], train=False)
        return normalized_psnr(z, batch["y"])

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay, checkpoint_name="iw3_da3mono_disparity")
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = DA3MonoDataset(size=args.size, num_samples=args.num_samples,
                              seed=args.seed)
    eval_ds = DA3MonoDataset(size=args.size,
                             num_samples=max(args.num_samples // 10,
                                             args.batch_size),
                             seed=args.seed + 1)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def benchmark_main(checkpoint=None, size=128, n=16, seed=137):
    """Normalized-PSNR benchmark (reference da3mono/benchmark.py)."""
    import jax
    import jax.numpy as jnp
    if checkpoint:
        from ...models.io import load_model
        model, params, _ = load_model(checkpoint)
    else:
        model = create_model("iw3.da3mono_disparity")
        params = model.init_params(jax.random.PRNGKey(0), (1, size, size, 1))
    ds = DA3MonoDataset(size=size, num_samples=n, seed=seed)
    scores = []
    for batch in ds.batches(4):
        z = model.apply_fn(params, jnp.asarray(batch["x"]), train=False)
        scores.append(float(-normalized_psnr(z, jnp.asarray(batch["y"]))))
    return sum(scores) / len(scores)


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("da3mono", parents=[default_parser],
                              help="DA3 depth->disparity head training")
    p.add_argument("--size", type=int, default=128)
    p.set_defaults(handler=train_main)
    return p

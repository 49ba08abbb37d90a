"""cliqa training addon — degradation-synthesis regression.

Behavioral parity target: reference cliqa/training/ trainers: each sample
is degraded with a KNOWN parameter (JPEG quality / gaussian-grain noise
level / pre-upscale factor) which becomes the regression target.
"""
from __future__ import annotations

import random

import numpy as np
from PIL import Image

from ..core.logger import logger
from ..models import create_model
from ..training.trainer import Trainer, TrainerConfig
from ..waifu2x.training.degrade import add_jpeg_noise, _matrix_resize
from ..waifu2x.training.generators import gen_random
from ..waifu2x.training.dataset import listdir_images


class CliqaDataset:
    """(patch, target) pairs with synthesized degradations."""

    def __init__(self, input_dir, kind: str, patch_size=128,
                 num_samples=10000, synthetic_p=0.0, seed=71, training=True):
        assert kind in {"jpeg", "noise", "resize"}
        self.files = listdir_images(input_dir) if input_dir else []
        if not self.files and synthetic_p < 1.0:
            raise RuntimeError(f"{input_dir} is empty")
        self.kind = kind
        self.patch_size = patch_size
        self.num_samples = num_samples
        self.synthetic_p = synthetic_p
        self.training = training
        self.seed = seed

    def sample_pair(self, index):
        rng = random.Random(hash((self.seed, index)))
        ps = self.patch_size
        if not self.files or rng.random() < self.synthetic_p:
            im = gen_random(ps + 32, seed=rng.randint(0, 2 ** 31))
        else:
            im = Image.open(rng.choice(self.files))
            im.load()
            if im.mode != "RGB":
                im = im.convert("RGB")
        w, h = im.size
        if w < ps or h < ps:
            im = im.resize((max(w, ps), max(h, ps)), Image.LANCZOS)
            w, h = im.size
        x0, y0 = rng.randint(0, w - ps), rng.randint(0, h - ps)
        im = im.crop((x0, y0, x0 + ps, y0 + ps))

        if self.kind == "jpeg":
            quality = rng.randint(5, 99)
            subsampling = rng.random() < 0.5
            im = add_jpeg_noise(im, quality,
                                "4:2:0" if subsampling else "4:4:4")
            x = np.asarray(im, np.float32) / 255.0
            return x, np.asarray([quality, float(subsampling)], np.float32)
        if self.kind == "noise":
            # noise level = 50 - PSNR; synth gaussian noise of known sigma
            level = rng.uniform(0.0, 30.0)
            sigma = 10 ** (-(50.0 - level) / 20.0)
            x = np.asarray(im, np.float32) / 255.0
            noise = np.random.default_rng(index).normal(
                0, sigma, x.shape).astype(np.float32)
            x = np.clip(x + noise, 0, 1)
            return x, np.asarray([level], np.float32)
        # resize: downscale by 1/s then back up (known pre-upscale factor)
        s = rng.uniform(1.0, 2.0)
        arr = np.asarray(im, np.float32) / 255.0
        small = _matrix_resize(arr, int(ps / s), int(ps / s), "catrom")
        x = _matrix_resize(small, ps, ps, "catrom", antialias=False)
        return x.astype(np.float32), np.asarray([s], np.float32)

    def batches(self, batch_size):
        n = (self.num_samples // batch_size) * batch_size
        for start in range(0, n, batch_size):
            xs, ys = zip(*(self.sample_pair(i)
                           for i in range(start, start + batch_size)))
            yield {"x": np.stack(xs), "y": np.stack(ys)}


def train_main(args):
    import jax
    import jax.numpy as jnp
    import optax

    arch = {"jpeg": "cliqa.jpeg_quality", "noise": "cliqa.grain_noise_level",
            "resize": "cliqa.scale_factor"}[args.kind]
    model = create_model(arch)
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, args.size, args.size, 3))

    def loss_fn(params, batch, rng):
        out = model.apply_fn(params, batch["x"], train=True)
        if args.kind == "jpeg":
            quality, subsampling = out
            l_q = jnp.mean(jnp.abs(quality[:, 0] - batch["y"][:, 0]))
            l_s = jnp.mean(optax.sigmoid_binary_cross_entropy(
                subsampling[:, 0], batch["y"][:, 1]))
            return l_q + l_s, {}
        return jnp.mean(jnp.abs(out[:, 0] - batch["y"][:, 0])), {}

    def eval_fn(params, batch):
        out = model.apply_fn(params, batch["x"], train=False)
        if args.kind == "jpeg":
            out = out[0]
        return jnp.mean(jnp.abs(out[:, 0] - batch["y"][:, 0]))

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        seed=args.seed,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1), resume=args.resume,
        checkpoint_name=arch.replace(".", "_"))
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = CliqaDataset(
        args.data_dir, args.kind, patch_size=args.size,
        num_samples=args.num_samples, synthetic_p=args.synthetic_p,
        seed=args.seed)
    eval_ds = CliqaDataset(
        args.data_dir, args.kind, patch_size=args.size,
        num_samples=max(args.num_samples // 10, args.batch_size),
        synthetic_p=args.synthetic_p, seed=args.seed + 1, training=False)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("cliqa", parents=[default_parser],
                              help="cliqa quality-predictor training")
    p.add_argument("--kind", default="jpeg",
                   choices=["jpeg", "noise", "resize"])
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--synthetic-p", type=float, default=0.0)
    p.set_defaults(handler=train_main)
    return p

"""stlizer outpaint training addon.

Behavioral parity target: reference stlizer/training/outpaint — the
outpaint net learns to fill stabilizer border holes; training pairs are
(image with warp-style border mask, full image).  Masks imitate the
stabilizing warp: random shift+rotation borders.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.logger import logger
from ..models import create_model
from ..modules import losses as L
from ..training.trainer import Trainer, TrainerConfig
from ..utils.image_loader import list_images
from . import light_outpaint_v1  # noqa: F401 (register)


def make_border_mask(rng, size):
    """Warp-like border mask: random shift + slight rotation hole."""
    dx = int(rng.integers(0, size // 8 + 1)) * int(rng.choice([-1, 1]))
    dy = int(rng.integers(0, size // 8 + 1)) * int(rng.choice([-1, 1]))
    mask = np.ones((size, size, 1), np.float32)
    y0, y1 = max(0, dy), min(size, size + dy)
    x0, x1 = max(0, dx), min(size, size + dx)
    mask[y0:y1, x0:x1] = 0.0
    return mask


class OutpaintDataset:
    def __init__(self, input_dir, size=256, num_samples=200, seed=71):
        self.files = (list_images(input_dir)
                      if input_dir and os.path.isdir(input_dir) else [])
        self.size = size
        self.num_samples = num_samples
        self.seed = seed

    def batches(self, batch_size):
        rng = np.random.default_rng(self.seed)
        for i in range(0, self.num_samples, batch_size):
            ys, masks = [], []
            for _ in range(batch_size):
                if self.files:
                    from PIL import Image
                    f = self.files[int(rng.integers(0, len(self.files)))]
                    with Image.open(f) as im:
                        y = np.asarray(
                            im.convert("RGB").resize((self.size, self.size)),
                            np.float32) / 255.0
                else:
                    from ..waifu2x.training.generators import gen_random
                    im = gen_random(self.size,
                                    seed=int(rng.integers(0, 2 ** 31)))
                    y = np.asarray(im.convert("RGB"), np.float32) / 255.0
                ys.append(y)
                masks.append(make_border_mask(rng, self.size))
            yield {"y": np.stack(ys), "mask": np.stack(masks)}


def train_main(args):
    import jax
    import jax.numpy as jnp
    model = create_model("stlizer.light_outpaint_v1")
    size = args.size
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, size, size, 3)),
                        mask=jnp.zeros((1, size, size, 1)),
                        train=False)["params"]
    dct = L.dct_loss(window_size=8, clamp=True, yrgb=False)

    def loss_fn(params, batch, rng):
        x = batch["y"] * (1.0 - batch["mask"])
        out, z = model.apply_fn(params, x, mask=batch["mask"], train=True)
        # full-image loss on the raw head keeps gradients outside the mask
        loss = L.clamp_loss_of(L.l1_loss)(out, batch["y"]) \
            + dct(z, batch["y"]) * 0.5
        return loss, {}

    def eval_fn(params, batch):
        x = batch["y"] * (1.0 - batch["mask"])
        out = model.apply_fn(params, x, mask=batch["mask"], train=False)
        return L.psnr(out, batch["y"])

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay,
        checkpoint_name="stlizer_light_outpaint_v1")
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = OutpaintDataset(os.path.join(args.data_dir, "train"),
                               size=size, num_samples=args.num_samples,
                               seed=args.seed)
    eval_ds = OutpaintDataset(os.path.join(args.data_dir, "eval"), size=size,
                              num_samples=max(args.num_samples // 10,
                                              args.batch_size),
                              seed=args.seed + 1)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("stlizer_outpaint", parents=[default_parser],
                              help="stlizer border outpaint net training")
    p.add_argument("--size", type=int, default=256)
    p.set_defaults(handler=train_main)
    return p

"""SOD (salient-object detection) training addon.

Behavioral parity target: reference iw3/training/sod/trainer.py — SODV1
trained with multi-output BCE-with-logits (deep supervision), PSNR eval.
Dataset: (image, saliency mask) pairs from `<data_dir>/<split>/img|mask`
directories, or synthetic shapes-on-background when absent.
"""
from __future__ import annotations

import os

import numpy as np

from ...models import create_model
from ...modules import losses as L
from ...training.trainer import Trainer, TrainerConfig
from ...utils.image_loader import list_images


def multi_bce(outputs, target, eps=1e-6):
    """reference MultiBCEWithLogitsLoss (:32-40): equally-weighted BCE over
    the deep-supervision outputs.  Our U2NETP emits sigmoid probability
    maps, so this is plain BCE on probabilities."""
    import jax.numpy as jnp
    outs = outputs if isinstance(outputs, (tuple, list)) else [outputs]
    w = 1.0 / len(outs)
    loss = 0.0
    for p in outs:
        p = jnp.clip(p.astype(jnp.float32), eps, 1.0 - eps)
        loss = loss + jnp.mean(-(target * jnp.log(p)
                                 + (1 - target) * jnp.log1p(-p))) * w
    return loss


def _synth_sample(rng, size):
    """Synthetic saliency pair: random shapes on a textured background.
    x is RGB + depth (4ch) — SODV1's input contract; salient blobs are
    closer (higher disparity)."""
    bg = rng.uniform(0, 1, (size, size, 3)).astype(np.float32) * 0.3
    depth = rng.uniform(0, 0.3, (size, size, 1)).astype(np.float32)
    mask = np.zeros((size, size, 1), np.float32)
    for _ in range(rng.integers(1, 4)):
        cy, cx = rng.integers(0, size, 2)
        r = int(rng.integers(size // 8, size // 3))
        yy, xx = np.mgrid[0:size, 0:size]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        color = rng.uniform(0.5, 1.0, (3,)).astype(np.float32)
        bg[blob] = color
        depth[blob] = rng.uniform(0.6, 1.0)
        mask[blob] = 1.0
    return np.concatenate([bg, depth], axis=-1), mask


class SODDataset:
    def __init__(self, input_dir, size=256, num_samples=500, seed=71):
        img_dir = os.path.join(input_dir, "img") if input_dir else ""
        self.files = list_images(img_dir) if os.path.isdir(img_dir) else []
        self.mask_dir = os.path.join(input_dir, "mask") if input_dir else ""
        self.size = size
        self.num_samples = num_samples
        self.seed = seed

    def batches(self, batch_size):
        from PIL import Image
        rng = np.random.default_rng(self.seed)
        for i in range(0, self.num_samples, batch_size):
            xs, ys = [], []
            for _ in range(batch_size):
                if self.files:
                    f = self.files[int(rng.integers(0, len(self.files)))]
                    mf = os.path.join(
                        self.mask_dir,
                        os.path.splitext(os.path.basename(f))[0] + ".png")
                    with Image.open(f) as im:
                        rgb = np.asarray(im.convert("RGB").resize(
                            (self.size, self.size)), np.float32) / 255.0
                    with Image.open(mf) as im:
                        y = np.asarray(im.convert("L").resize(
                            (self.size, self.size)), np.float32)[..., None] / 255.0
                    # luminance stand-in for the depth channel when the
                    # dataset has no exported depth (reference trains on
                    # RGB + depth-model output)
                    lum = rgb.mean(axis=-1, keepdims=True)
                    x = np.concatenate([rgb, lum], axis=-1)
                else:
                    x, y = _synth_sample(rng, self.size)
                xs.append(x)
                ys.append(y)
            yield {"x": np.stack(xs), "y": np.stack(ys)}


def train_main(args):
    import jax
    from ...modules.resize import resize
    model = create_model("iw3.sod_v1")
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, args.size, args.size, 4))

    def loss_fn(params, batch, rng):
        out = model.apply_fn(params, batch["x"], train=True)
        # train-mode side outputs are at the net's internal 192px size
        ref = out[0] if isinstance(out, (tuple, list)) else out
        y = batch["y"]
        if y.shape[1:3] != ref.shape[1:3]:
            y = resize(y, ref.shape[1], ref.shape[2], mode="bilinear",
                       antialias=True)
        return multi_bce(out, y), {}

    def eval_fn(params, batch):
        # eval mode returns the clipped probability map at input size
        out = model.apply_fn(params, batch["x"], train=False)
        return L.psnr(out, batch["y"])

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        scheduler=args.scheduler, seed=args.seed, resume=args.resume,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        ema_decay=args.ema_decay, checkpoint_name="iw3_sod_v1")
    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size)
    train_ds = SODDataset(os.path.join(args.data_dir, "train"),
                          size=args.size, num_samples=args.num_samples,
                          seed=args.seed)
    eval_ds = SODDataset(os.path.join(args.data_dir, "eval"), size=args.size,
                         num_samples=max(args.num_samples // 10,
                                         args.batch_size),
                         seed=args.seed + 1)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("sod", parents=[default_parser],
                              help="iw3 salient-object-detection training")
    p.add_argument("--size", type=int, default=256)
    p.set_defaults(handler=train_main)
    return p

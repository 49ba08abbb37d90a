"""imagenet training addon (reference imagenet/training/).

Dataset layout: data_dir/train/<class_name>/*.jpg, data_dir/eval/<...>.
"""
from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image

from ..core.logger import logger
from ..models import create_model
from ..training.trainer import Trainer, TrainerConfig
from ..training.confusion_matrix import SoftmaxConfusionMatrix


class ImageFolderDataset:
    def __init__(self, root, size=224, training=True, num_samples=None,
                 seed=71):
        self.classes = sorted(d for d in os.listdir(root)
                              if os.path.isdir(os.path.join(root, d)))
        if not self.classes:
            raise RuntimeError(f"{root}: no class directories")
        self.samples = []
        for ci, cname in enumerate(self.classes):
            cdir = os.path.join(root, cname)
            for f in sorted(os.listdir(cdir)):
                if os.path.splitext(f)[1].lower() in {
                        ".jpg", ".jpeg", ".png", ".webp"}:
                    self.samples.append((os.path.join(cdir, f), ci))
        self.size = size
        self.training = training
        self.num_samples = num_samples or len(self.samples)
        self.rng = random.Random(seed)

    def sample_pair(self, index):
        rng = random.Random(hash((index, self.rng.random() if self.training
                                  else 0)))
        path, label = self.samples[index % len(self.samples)]
        im = Image.open(path)
        im.load()
        if im.mode != "RGB":
            im = im.convert("RGB")
        s = self.size
        w, h = im.size
        if self.training:
            scale = rng.uniform(0.7, 1.0)
            cw = max(s // 2, int(min(w, h) * scale))
            x0 = rng.randint(0, max(0, w - cw))
            y0 = rng.randint(0, max(0, h - cw))
            im = im.crop((x0, y0, x0 + cw, y0 + cw)).resize((s, s),
                                                            Image.BILINEAR)
            if rng.random() < 0.5:
                im = im.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
        else:
            m = min(w, h)
            im = im.crop(((w - m) // 2, (h - m) // 2,
                          (w + m) // 2, (h + m) // 2)).resize(
                (s, s), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0, label

    def batches(self, batch_size):
        n = (self.num_samples // batch_size) * batch_size
        order = list(range(n))
        if self.training:
            self.rng.shuffle(order)
        for start in range(0, n, batch_size):
            xs, ys = zip(*(self.sample_pair(i)
                           for i in order[start:start + batch_size]))
            yield {"x": np.stack(xs), "y": np.asarray(ys, np.int32)}


def train_main(args):
    import jax
    import jax.numpy as jnp
    import optax

    train_ds = ImageFolderDataset(os.path.join(args.data_dir, "train"),
                                  size=args.size,
                                  num_samples=args.num_samples)
    eval_ds = ImageFolderDataset(os.path.join(args.data_dir, "eval"),
                                 size=args.size, training=False)
    num_classes = len(train_ds.classes)
    model = create_model(args.arch, num_classes=num_classes)
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               (1, args.size, args.size, 3))

    def loss_fn(params, batch, rng):
        logits = model.apply_fn(params, batch["x"], train=True)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["y"]).mean()
        return loss, {}

    def eval_fn(params, batch):
        logits = model.apply_fn(params, batch["x"], train=False)
        # negative accuracy: best_is_min
        return -jnp.mean((jnp.argmax(logits, -1) == batch["y"]).astype(
            jnp.float32))

    cfg = TrainerConfig(
        model_dir=args.model_dir, max_epoch=args.max_epoch,
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, scheduler=args.scheduler,
        seed=args.seed,
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1), resume=args.resume,
        checkpoint_name=args.arch.replace(".", "_"))

    # vgg11's FrozenBatchNorm stores running stats as params the jitted
    # step never updates; recalibrate them from training batches before
    # every eval / best-model export (torch BN momentum equivalent)
    has_bn = any(n.startswith("bn") for n in params)
    eval_params_fn = None
    if has_bn:
        def eval_params_fn(p):
            return calibrate_bn(model, p,
                                train_ds.batches(args.batch_size),
                                max_batches=16)

    trainer = Trainer(cfg, model, params, loss_fn, eval_fn,
                      steps_per_epoch=args.num_samples // args.batch_size,
                      eval_params_fn=eval_params_fn)
    trainer.fit(lambda: train_ds.batches(args.batch_size),
                lambda: eval_ds.batches(args.batch_size))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("imagenet", parents=[default_parser],
                              help="imagenet classifier training")
    p.add_argument("--arch", default="imagenet.vgg11",
                   choices=["imagenet.vgg11", "imagenet.swin_t"])
    p.add_argument("--size", type=int, default=224)
    p.set_defaults(handler=train_main)
    return p


def calibrate_bn(model, params, batches, max_batches: int = 64):
    """Refresh VGG11 FrozenBatchNorm running stats after training.

    The jitted train step normalizes by batch statistics but cannot mutate
    params (pure function); this post-training sweep recomputes each BN
    layer's running mean/var over `batches` — the functional equivalent of
    torch BN momentum accumulation (reference trains torch BatchNorm2d in
    torchvision vgg11_bn, imagenet/models/torchvision_models.py:10).

    Returns a new params tree with updated bn*/mean and bn*/var.
    """
    import jax
    import numpy as np

    bn_names = sorted(n for n in params if n.startswith("bn"))
    if not bn_names:
        return params

    # capture each BN layer's INPUT via per-layer intermediate taps:
    # run the conv prefix up to each bn layer.  Cheap approach: use
    # flax capture_intermediates on the conv outputs.  The capture
    # forward runs train=True (use_batch_stats) so EARLIER layers
    # normalize by batch statistics — each captured input then matches
    # the training-forward distribution the refreshed stats must
    # describe, not a forward through the stale stats being replaced.
    def fwd(p, x):
        _, inter = model.apply(
            {"params": p}, x, train=True,
            capture_intermediates=lambda mdl, _: mdl.name is not None
            and mdl.name.startswith("conv"), mutable=["intermediates"])
        return inter["intermediates"]

    fwd = jax.jit(fwd)
    sums = {n: None for n in bn_names}
    sqs = {n: None for n in bn_names}
    count = {n: 0 for n in bn_names}
    seen = 0
    for batch in batches:
        x = batch["x"] if isinstance(batch, dict) else batch
        inter = fwd(params, x)
        for n in bn_names:
            conv = "conv" + n[2:]
            v = np.asarray(jax.tree.leaves(inter[conv])[0], np.float64)
            flat = v.reshape(-1, v.shape[-1])
            s, q = flat.sum(0), (flat ** 2).sum(0)
            sums[n] = s if sums[n] is None else sums[n] + s
            sqs[n] = q if sqs[n] is None else sqs[n] + q
            count[n] += flat.shape[0]
        seen += 1
        if seen >= max_batches:
            break

    out = dict(params)
    for n in bn_names:
        mean = sums[n] / count[n]
        var = sqs[n] / count[n] - mean ** 2
        bn = dict(out[n])
        bn["mean"] = mean.astype(np.float32)
        bn["var"] = np.maximum(var, 0).astype(np.float32)
        out[n] = bn
    return out

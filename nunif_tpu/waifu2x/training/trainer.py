"""waifu2x training app — PSNR and GAN modes.

Behavioral parity target: reference waifu2x/training/trainer.py
(Waifu2xTrainer/Waifu2xEnv): loss table, per-arch dataset offsets,
luminance-PSNR eval, GAN mode with adaptive discriminator weight +
conditional discriminators + generator warmup, checkpoint/best-model
export.

Functional JAX design: PSNR mode uses the generic jitted train step
(training/env.py), GAN mode the jitted GAN step (training/gan.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ...core.logger import logger
from ...models import create_model
from ...modules import losses as L
from ...training.trainer import Trainer, TrainerConfig
from .dataset import Waifu2xDataset


def _aux(loss_fn):
    return L.auxiliary_loss((loss_fn, loss_fn), (1.0, 0.5))


def _lpips_criterion(base_loss, weight, std_mask=False):
    """reference LPIPSWith: base + weight * LPIPS.  The VGG16 trunk
    converts from a torchvision vgg16 .pth when NUNIF_LPIPS_VGG points at
    one; otherwise random-init (stationary random features — usable
    training signal, not released-weight parity)."""
    import os as _os
    import jax
    import jax.numpy as jnp
    from ...modules.lpips import LPIPS, lpips_with
    from ...core.logger import logger

    model = LPIPS()
    vgg_ckpt = _os.environ.get("NUNIF_LPIPS_VGG")
    if vgg_ckpt:
        from ...models.pth_import import load_torch_checkpoint
        from ...models.torch_convert import convert_vgg16_features
        _n, _k, sd = load_torch_checkpoint(vgg_ckpt)
        params = {"params": {"net": convert_vgg16_features(sd)["params"]}}
    else:
        logger.warning("LPIPS: random-init VGG trunk "
                       "(set NUNIF_LPIPS_VGG=<torchvision vgg16 .pth>)")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3), jnp.float32),
                            jnp.zeros((1, 32, 32, 3), jnp.float32))
    fn = lpips_with(base_loss, weight=weight, std_mask=std_mask)
    return lambda x, y: fn(params, x, y)


def _l4sn_criterion(base_loss, weight, swd_weight=0.0):
    """reference L4SNWith (waifu2x trainer:110-112): base +
    weight * L4SN feature loss (+ optional sliced-wasserstein term)."""
    import jax
    from ...dino.l4sn import L4SNFeature, l4sn_feature_loss
    from ...core.logger import logger

    model = L4SNFeature()
    logger.warning("L4SN: random-init feature net (train one with the "
                   "dino addon for the reference's trained weights)")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))

    def fn(x, y):
        return base_loss(x, y) + l4sn_feature_loss(
            model, params, x, y, weight=weight, swd_weight=swd_weight)
    return fn


def create_criterion(name: str):
    """reference waifu2x/training/trainer.py:67-117 LOSS_FUNCTIONS —
    full table.  Random-augmented entries return fns marked
    ``needs_rng``; the step threads its PRNG key."""
    from ...modules.dinov2_loss import dinov2_with

    clamp_l1 = lambda: L.clamp_loss_of(L.l1_loss)  # noqa: E731
    alex11 = lambda: L.clamp_loss_of(                       # noqa: E731
        L.luminance_weighted(L.alex11_loss(in_channels=1)))
    table = {
        "l1": clamp_l1,
        "y_l1": lambda: L.luminance_weighted(L.clamp_loss_of(L.l1_loss)),
        "charbonnier": lambda: L.clamp_loss_of(L.charbonnier_loss),
        "y_charbonnier": lambda: L.luminance_weighted(
            L.clamp_loss_of(L.charbonnier_loss)),
        "lbp": lambda: L.ylbp_loss(kernel_size=3),
        "lbpm": lambda: L.multiscale_loss(L.ylbp_loss(kernel_size=3)),
        "lbp5": lambda: L.ylbp_loss(kernel_size=5),
        "lbp5m": lambda: L.multiscale_loss(L.ylbp_loss(kernel_size=5)),
        "yrgb_l1lbp5": lambda: L.yrgb_l1_lbp_loss(kernel_size=5, weight=0.4),
        "yrgb_l1lbp": lambda: L.yrgb_l1_lbp_loss(kernel_size=3, weight=0.4),
        "yrgb_flatlbp5": lambda: L.yrgb_flat_lbp_loss(kernel_size=5,
                                                      weight=0.4),
        "yrgb_lbp": lambda: L.yrgb_lbp_loss(kernel_size=3),
        "yrgb_lbp5": lambda: L.yrgb_lbp_loss(kernel_size=5),
        "alex11": alex11,
        "y_l1fftgrad": lambda: L.yrgb_l1_fft_gradient_loss(
            fft_weight=0.1, grad_weight=0.1, diag=False),
        "dct": lambda: L.dct_loss_ex(window_size=None, clamp=True),
        "dctirm": lambda: L.dctirm_loss(),
        "dctir24": lambda: L.dctir24_loss(),
        "fft": lambda: L.fft_loss(),
        "aux_lbp": lambda: _aux(L.ylbp_loss(kernel_size=3)),
        "aux_alex11": lambda: _aux(alex11()),
        "aux_charbonnier": lambda: _aux(L.clamp_loss_of(L.charbonnier_loss)),
        "aux_y_charbonnier": lambda: _aux(
            L.luminance_weighted(L.clamp_loss_of(L.charbonnier_loss))),
        "l1lpips": lambda: _lpips_criterion(clamp_l1(), weight=0.4),
        "l1lpips_std_mask": lambda: _lpips_criterion(
            clamp_l1(), weight=0.4, std_mask=True),
        "l1lpips_dct24": lambda: _lpips_criterion(
            L.weighted_loss(
                (clamp_l1(),
                 L.dct_loss_ex(window_size=24, clamp=True, overlap=True)),
                (1.0, 0.2)),
            weight=0.4),
        "l1dinov2": lambda: dinov2_with(clamp_l1(), kind="pool", weight=0.1),
        "l1dinov2_10": lambda: dinov2_with(clamp_l1(), kind="pool",
                                           weight=1.0),
        "yrgb_lbp_dinov2": lambda: dinov2_with(
            L.yrgb_lbp_loss(kernel_size=3), kind="cosine", weight=2.0),
        "l1l4sn": lambda: _l4sn_criterion(clamp_l1(), weight=1.0),
        "l1l4sn2": lambda: _l4sn_criterion(clamp_l1(), weight=2.0),
        "l1l4sn_swd": lambda: _l4sn_criterion(clamp_l1(), weight=1.0,
                                              swd_weight=0.1),
        "aux_lbp_ident": lambda: L.auxiliary_loss(
            (L.ylbp_loss(kernel_size=3), L.identity_loss()), (1.0, 1.0)),
        "ident": lambda: L.identity_loss(),
    }
    if name not in table:
        raise ValueError(f"unknown loss: {name} (known: {sorted(table)})")
    return table[name]()


DEFAULT_LOSSES = {
    "waifu2x.vgg_7": "y_charbonnier",
    "waifu2x.upconv_7": "y_charbonnier",
    "waifu2x.cunet": "aux_lbp",
    "waifu2x.upcunet": "aux_lbp",
    "waifu2x.swin_unet_1x": "lbp",
    "waifu2x.swin_unet_2x": "lbp",
    "waifu2x.swin_unet_4x": "lbp5",
    "waifu2x.swin_unet_v2_1x": "lbp",
    "waifu2x.swin_unet_v2_2x": "lbp",
    "waifu2x.swin_unet_v2_4x": "lbp5",
    # PSNR-acceptance arch (benchmark protocol): luma-weighted charbonnier
    "waifu2x.turbo_2x": "y_charbonnier",
}


class Waifu2xTrainerApp:
    """Assembles dataset + model + steps from parsed args and runs fit()."""

    def __init__(self, args):
        self.args = args
        import jax
        self.model = create_model(args.arch)
        tile = self.model.find_valid_tile_size(args.size)
        self.tile_size = tile
        self.params = self.model.init_params(
            jax.random.PRNGKey(args.seed), (1, tile, tile, 3))

        loss_name = args.loss or DEFAULT_LOSSES.get(args.arch, "y_charbonnier")
        base_loss = create_criterion(loss_name)
        aux = loss_name.startswith("aux_")

        model = self.model

        loss_kwargs = {}
        if getattr(base_loss, "needs_rng", False):
            # random-augmented losses (dctirm family) consume the step key
            loss_kwargs = None

        def loss_fn(params, batch, rng):
            pred = model.apply_fn(params, batch["x"], train=True)
            kw = {"rng": rng} if loss_kwargs is None else loss_kwargs
            if aux and isinstance(pred, tuple):
                return base_loss(pred, batch["y"], **kw), {}
            if isinstance(pred, tuple):
                pred = pred[0]
            return base_loss(pred, batch["y"], **kw), {}

        def eval_fn(params, batch):
            pred = model.apply_fn(params, batch["x"], train=False)
            if isinstance(pred, tuple):
                pred = pred[0]
            # luminance_psnr already returns NEGATIVE Y-PSNR: best_is_min
            # (reference LuminancePSNREnv)
            return L.luminance_psnr(pred, batch["y"])

        cfg = TrainerConfig(
            model_dir=args.model_dir, max_epoch=args.max_epoch,
            optimizer=args.optimizer, learning_rate=args.learning_rate,
            weight_decay=args.weight_decay, scheduler=args.scheduler,
            accum_steps=args.backward_steps, ema_decay=args.ema_decay,
            seed=args.seed, resume=args.resume,
            steps_per_dispatch=getattr(args, "steps_per_dispatch", 1),
            checkpoint_name=args.arch.replace(".", "_"))
        self.trainer = Trainer(cfg, self.model, self.params, loss_fn,
                               eval_fn,
                               steps_per_epoch=args.num_samples // args.batch_size)

        offset = self.model.i2i_offset
        scale = self.model.i2i_scale
        common = dict(
            model_offset=offset, scale_factor=scale, tile_size=tile,
            style=args.style, noise_level=args.noise_level,
            synthetic_p=args.synthetic_p,
            bicubic_only=args.deblur == 0 and args.bicubic_only)
        self.train_ds = Waifu2xDataset(
            os.path.join(args.data_dir, "train") if args.data_dir else None,
            num_samples=args.num_samples,
            da_unsharpmask_p=args.da_unsharpmask_p,
            da_grayscale_p=args.da_grayscale_p,
            training=True, seed=args.seed, **common)
        self.eval_ds = Waifu2xDataset(
            os.path.join(args.data_dir, "eval") if args.data_dir else None,
            num_samples=max(args.num_samples // 10, args.batch_size),
            training=False, seed=args.seed + 1, **common)

    def fit(self):
        args = self.args
        # hard example mining (reference waifu2x/training/trainer.py:697):
        # weighted-with-replacement sampling driven by per-sample loss SMA
        sampler = None
        hard_example = getattr(args, "hard_example", "linear")
        if hard_example != "none":
            from ...training.sampler import HardExampleSampler, MiningMethod
            method = {"linear": MiningMethod.LINEAR,
                      "top10": MiningMethod.TOP10,
                      "top20": MiningMethod.TOP20}[hard_example]
            sampler = HardExampleSampler(
                self.train_ds.num_samples, method=method,
                scale_factor=getattr(args, "hard_example_scale", 4.0),
                seed=args.seed)
        self.sampler = sampler
        self.trainer.fit(
            lambda: self.train_ds.batches(args.batch_size,
                                          n_threads=args.num_workers,
                                          sampler=sampler),
            lambda: self.eval_ds.batches(args.batch_size,
                                         n_threads=args.num_workers),
            hard_sampler=sampler)
        return self.trainer


def train_main(args):
    app = Waifu2xTrainerApp(args)
    app.fit()
    return 0


def create_training_data_main(args):
    """Split source images into training tiles
    (reference waifu2x/training/create_training_data.py)."""
    from PIL import Image
    from .dataset import listdir_images
    files = listdir_images(args.dataset_dir)
    os.makedirs(os.path.join(args.data_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.data_dir, "eval"), exist_ok=True)
    n_eval = max(1, int(len(files) * args.eval_rate))
    size = args.size
    count = 0
    for i, f in enumerate(files):
        split = "eval" if i < n_eval else "train"
        im = Image.open(f)
        im.load()
        if im.mode != "RGB":
            im = im.convert("RGB")
        w, h = im.size
        for y0 in range(0, h - size + 1, size):
            for x0 in range(0, w - size + 1, size):
                tile = im.crop((x0, y0, x0 + size, y0 + size))
                tile.save(os.path.join(
                    args.data_dir, split, f"{i:06d}_{y0}_{x0}.png"))
                count += 1
    logger.info("created %d tiles from %d images", count, len(files))
    return 0


def register_train(subparsers, default_parser):
    p = subparsers.add_parser("waifu2x", parents=[default_parser],
                              help="waifu2x SR/denoise training")
    p.add_argument("--arch", default="waifu2x.swin_unet_2x")
    p.add_argument("--style", default="art", choices=["art", "photo"])
    p.add_argument("--noise-level", type=int, default=-1,
                   choices=[-1, 0, 1, 2, 3])
    p.add_argument("--size", type=int, default=104)
    p.add_argument("--loss", default=None)
    p.add_argument("--synthetic-p", type=float, default=0.0,
                   help="probability of synthetic screentone/dot/text images")
    p.add_argument("--da-unsharpmask-p", type=float, default=0.0)
    p.add_argument("--da-grayscale-p", type=float, default=0.0)
    p.add_argument("--bicubic-only", action="store_true")
    p.add_argument("--deblur", type=float, default=0)
    p.add_argument("--hard-example", default="linear",
                   choices=["none", "linear", "top10", "top20"],
                   help="hard example mining (reference --hard-example)")
    p.add_argument("--hard-example-scale", type=float, default=4.0)
    p.set_defaults(handler=train_main)
    return p


def register_create_training_data(subparsers, default_parser):
    p = subparsers.add_parser("waifu2x", parents=[default_parser],
                              help="split images into waifu2x training tiles")
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--eval-rate", type=float, default=0.05)
    p.set_defaults(handler=create_training_data_main)
    return p

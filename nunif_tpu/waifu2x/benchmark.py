"""waifu2x quality benchmark — PSNR / Y-PSNR vs a catrom-downscale baseline.

Behavioral parity target: reference waifu2x/benchmark.py:28-273 — for each
image in the eval dir: downscale by 1/scale (catrom, antialias), run the
model (and baseline filters) back up, report mean PSNR / Y-PSNR and time;
optional JPEG noise before upscaling to measure denoise+SR.

Usage:
  python -m nunif_tpu.waifu2x.benchmark -i ./eval_images \
      --model-file model.nztm [--baseline] [--noise-level 1]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

from ..core.logger import logger
from ..modules.resize import resize_matrix


def _np_resize(arr, out_h, out_w, mode="catrom", antialias=True):
    mh = resize_matrix(arr.shape[0], out_h, mode, antialias)
    mw = resize_matrix(arr.shape[1], out_w, mode, antialias)
    out = np.einsum("oh,hwc->owc", mh, arr)
    return np.clip(np.einsum("pw,owc->opc", mw, out), 0.0, 1.0)


def psnr(a, b):
    mse = np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2)
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def y_psnr(a, b):
    w = np.array([0.299, 0.587, 0.114], np.float32)
    return psnr(a @ w, b @ w)


def iter_images(d):
    from .training.dataset import listdir_images
    from ..utils.pil_io import load_image
    for f in listdir_images(d):
        x, _ = load_image(f)
        yield f, x[..., :3]


def main(argv=None):
    # first-run UX: persistent compile cache (core/compile_cache.py)
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="waifu2x.benchmark", description=__doc__)
    p.add_argument("--input", "-i", required=True, help="eval image dir")
    p.add_argument("--model-file", default=None, help=".nztm checkpoint")
    p.add_argument("--arch", default=None,
                   help="random-init arch instead of checkpoint (perf only)")
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--noise-level", type=int, default=-1,
                   choices=[-1, 0, 1, 2, 3])
    p.add_argument("--style", default="art", choices=["art", "photo"])
    p.add_argument("--baseline", action="store_true",
                   help="also measure catrom/lanczos upscale baselines")
    p.add_argument("--tile-size", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--output", "-o", default=None, help="CSV output path")
    args = p.parse_args(argv)

    import jax
    from ..models import create_model
    from ..models.io import load_model
    from ..utils import TiledRenderer
    from . import models as _m  # noqa: F401

    model = params = None
    if args.model_file:
        model, params, _ = load_model(args.model_file)
    elif args.arch:
        model = create_model(args.arch)
        params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params) if model is not None else None

    rows = []
    t_model = 0.0
    n = 0
    for path, hr in iter_images(args.input):
        h, w = hr.shape[:2]
        h -= h % args.scale
        w -= w % args.scale
        hr = hr[:h, :w]
        lr = _np_resize(hr, h // args.scale, w // args.scale)
        if args.noise_level >= 0:
            from PIL import Image
            from .training.degrade import add_jpeg_noise, EVAL_QUALITY
            im = Image.fromarray((lr * 255 + 0.5).astype(np.uint8))
            for q in EVAL_QUALITY[args.style][args.noise_level]:
                im = add_jpeg_noise(im, q, "4:2:0")
            lr = np.asarray(im, np.float32) / 255.0

        row = {"file": os.path.basename(path)}
        if renderer is not None:
            t0 = time.perf_counter()
            sr = np.asarray(renderer.render(lr, tile_size=args.tile_size,
                                            batch_size=args.batch_size))
            t_model += time.perf_counter() - t0
            if model.i2i_scale != args.scale:
                sr = _np_resize(sr, h, w)
            row["psnr"] = round(psnr(sr, hr), 4)
            row["y_psnr"] = round(y_psnr(sr, hr), 4)
        if args.baseline:
            for mode in ("catrom", "lanczos", "bilinear"):
                up = _np_resize(lr, h, w, mode=mode, antialias=False)
                row[f"{mode}_psnr"] = round(psnr(up, hr), 4)
                row[f"{mode}_y_psnr"] = round(y_psnr(up, hr), 4)
        rows.append(row)
        n += 1

    if not rows:
        print("no images found", file=sys.stderr)
        return 1

    keys = [k for k in rows[0] if k != "file"]
    means = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    for k, v in means.items():
        print(f"mean {k}: {v:.4f}")
    if renderer is not None:
        print(f"model time: {t_model:.2f}s ({n / max(t_model, 1e-9):.2f} img/s)")
    if args.output:
        with open(args.output, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["file"] + keys)
            writer.writeheader()
            writer.writerows(rows)
        logger.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Dump downscaled variants of images with every training filter for visual
and PSNR comparison.

Behavioral parity target: reference waifu2x/training/downscaling_test.py —
for each input image, write ``<name>_<filter>_blur<b>.png`` for the
ImageMagick filters (box/catrom/lanczos/sinc × blur jitter) and the
framework resize modes (bilinear/bicubic ± antialias), so dataset-
degradation choices can be eyeballed; additionally prints round-trip PSNR
(down 2x then bicubic up) per variant.

Usage:
    python -m nunif_tpu.waifu2x.training.downscaling_test -i dir/ -o out/
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import jax.numpy as jnp

from ...modules.resize import resize
from ...modules.losses import psnr
from ...utils.image_loader import list_images
from ...utils.pil_io import load_image, save_image

# training degrade filters (waifu2x/training/degrade.py maps these onto
# reference ImageMagick filter_type × blur jitter)
VARIANTS = [
    ("box", "box", False, 1.0),
    ("bilinear", "bilinear", True, 1.0),
    ("bicubic_aa", "bicubic", True, 1.0),
    ("bicubic", "bicubic", False, 1.0),
    ("lanczos_aa", "lanczos", True, 1.0),
    ("catrom_aa", "catrom", True, 1.0),
    ("catrom_blur095", "catrom", True, 0.95),
    ("catrom_blur105", "catrom", True, 1.05),
]


def _modcrop(x, mod=4):
    h = x.shape[0] - x.shape[0] % mod
    w = x.shape[1] - x.shape[1] % mod
    return x[:h, :w]


def downscale_variants(x, scale: int = 2):
    """Yield (name, downscaled, roundtrip_psnr) per variant."""
    from .degrade import _matrix_resize
    x = np.asarray(_modcrop(x)[..., :3], np.float32)
    H, W = x.shape[0], x.shape[1]
    for name, mode, antialias, blur in VARIANTS:
        lo = _matrix_resize(x, H // scale, W // scale, mode,
                            blur=blur, antialias=antialias)
        up = resize(jnp.asarray(lo)[None], H, W, mode="bicubic",
                    antialias=False)
        p = -float(psnr(jnp.clip(up, 0, 1), jnp.asarray(x)[None]))
        yield name, np.clip(lo, 0, 1), p


def main(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--input", "-i", required=True,
                   help="input image file or dir")
    p.add_argument("--output", "-o", required=True, help="output dir")
    p.add_argument("--scale", type=int, default=2, choices=[2, 4])
    args = p.parse_args(argv)
    files = (list_images(args.input) if os.path.isdir(args.input)
             else [args.input])
    os.makedirs(args.output, exist_ok=True)
    for f in files:
        x, _meta = load_image(f)
        base = os.path.splitext(os.path.basename(f))[0]
        for name, lo, p_rt in downscale_variants(x, scale=args.scale):
            out = os.path.join(args.output, f"{base}_{name}.png")
            save_image(lo, out)
            print(f"{base} {name}: roundtrip_psnr={p_rt:.2f} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

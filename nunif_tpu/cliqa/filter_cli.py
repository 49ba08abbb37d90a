"""cliqa dataset-filter CLIs.

Behavioral parity target: reference cliqa/filter_low_quality_jpeg.py /
filter_noise.py / filter_resize_quality.py — score every image, copy (or
symlink) those at or above the threshold into the output dir.

Usage:
  python -m nunif_tpu.cliqa.filter_cli jpeg  -i src/ -o dst/ --filter 85
  python -m nunif_tpu.cliqa.filter_cli noise -i src/ -o dst/ --filter 38
  python -m nunif_tpu.cliqa.filter_cli resize -i src/ -o dst/ --filter 90
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

from ..core.logger import logger


def main(argv=None):
    p = argparse.ArgumentParser(prog="cliqa.filter", description=__doc__)
    p.add_argument("kind", choices=["jpeg", "noise", "resize"])
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--filter", type=float, required=True,
                   help="keep images scoring >= this value")
    p.add_argument("--checkpoint", default=None, help=".nztm model file")
    p.add_argument("--symlink", action="store_true")
    p.add_argument("--num-patches", type=int, default=8)
    p.add_argument("--score-prefix", action="store_true",
                   help="prefix output names with the score")
    args = p.parse_args(argv)

    import jax
    from ..models import create_model
    from ..models.io import load_model
    from ..utils.pil_io import load_image
    from ..waifu2x.training.dataset import listdir_images
    from . import utils as U

    arch = {"jpeg": "cliqa.jpeg_quality", "noise": "cliqa.grain_noise_level",
            "resize": "cliqa.scale_factor"}[args.kind]
    if args.checkpoint:
        model, params, _ = load_model(args.checkpoint)
    else:
        model = create_model(arch)
        params = model.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
        logger.warning("cliqa: random init (no --checkpoint); scores are "
                       "meaningless, structure/smoke use only")

    os.makedirs(args.output, exist_ok=True)
    kept = total = 0
    for f in listdir_images(args.input):
        x, _ = load_image(f)
        x = x[..., :3]
        if args.kind == "jpeg":
            score, _ = U.predict_jpeg_quality(model, params, x,
                                              args.num_patches)
        elif args.kind == "noise":
            score = U.predict_grain_noise_psnr(model, params, x,
                                               args.num_patches)
        else:
            score = U.predict_resize_quality(model, params, x,
                                             args.num_patches)
        total += 1
        if score >= args.filter:
            kept += 1
            name = os.path.basename(f)
            if args.score_prefix:
                name = f"{score:08.3f}_{name}"
            dst = os.path.join(args.output, name)
            if args.symlink:
                if not os.path.lexists(dst):
                    os.symlink(os.path.abspath(f), dst)
            else:
                shutil.copy2(f, dst)
    print(f"kept {kept}/{total} images", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

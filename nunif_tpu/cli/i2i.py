"""Generic tiled inference for any I2I checkpoint (reference nunif/cli/i2i.py).

Usage: python -m nunif_tpu.cli.i2i -m model.nztm -i in.png -o out.png
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _tile_size_arg(v):
    """int or "HxW" (rectangular tiles, e.g. 592x1936)."""
    if v is None:
        return None
    s = str(v).lower()
    if "x" in s:
        h, w = s.split("x")
        return (int(h), int(w))
    return int(s)

def main(argv=None):
    p = argparse.ArgumentParser(prog="i2i", description=__doc__)
    p.add_argument("--model-file", "-m", required=True)
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--tile-size", type=_tile_size_arg, default=None,
                   help="tile size: int or HxW (e.g. 592x1936)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--tta", action="store_true")
    args = p.parse_args(argv)

    from ..models.io import load_model
    from ..utils import TiledRenderer
    from ..utils.pil_io import load_image, save_image
    from ..transforms.tta import tta_render

    model, params, _ = load_model(args.model_file)
    renderer = TiledRenderer(model, params)

    def run_one(src, dst):
        x, meta = load_image(src)
        x = x[..., :3]
        if args.tta:
            y = tta_render(renderer, x, tile_size=args.tile_size,
                           batch_size=args.batch_size)
        else:
            y = renderer.render(x, tile_size=args.tile_size,
                                batch_size=args.batch_size)
        save_image(np.asarray(y), dst, meta)

    if os.path.isdir(args.input):
        os.makedirs(args.output, exist_ok=True)
        from ..waifu2x.training.dataset import listdir_images
        for f in listdir_images(args.input):
            base = os.path.splitext(os.path.basename(f))[0]
            run_one(f, os.path.join(args.output, base + ".png"))
    else:
        run_one(args.input, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())

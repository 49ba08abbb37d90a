"""count_mask — measure the black/white pixel ratio over mask images.

Behavioral parity target: reference iw3/training/sbs/count_mask.py:1-35 —
scans a directory for ``*_ML.png`` occlusion-mask files and reports the
background/foreground pixel ratio (the reference notes ~900:1), used to
pick the positive-class weighting for mask-loss training.

Usage:
  python -m nunif_tpu.iw3.training.sbs.count_mask -i mask_dir
"""
from __future__ import annotations

import argparse
import random
import sys

import numpy as np
from PIL import Image

from ....utils.image_loader import list_images


def count_mask_ratio(input_dir: str, suffix: str = "_ML.png",
                     progress_every: int = 1000, log=print):
    """Returns (bg_pixels, fg_pixels) summed over all mask files."""
    files = [fn for fn in list_images(input_dir) if fn.endswith(suffix)]
    random.shuffle(files)  # progress prints approximate the full-set ratio
    fg_sum = 0
    bg_sum = 0
    for i, fn in enumerate(files, 1):
        x = np.asarray(Image.open(fn), np.float32)
        if x.ndim == 3:
            x = x.sum(axis=-1)
        fg = int((x > 0).sum())
        fg_sum += fg
        bg_sum += x.size - fg
        if progress_every and i % progress_every == 0:
            log(f"black/white = {bg_sum / max(fg_sum, 1):.2f}")
    return bg_sum, fg_sum


def main(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="measure white/black pixel ratio of *_ML.png masks")
    p.add_argument("--input", "-i", required=True, help="input dir")
    args = p.parse_args(argv)
    bg, fg = count_mask_ratio(args.input)
    print(f"black/white = {bg / max(fg, 1):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

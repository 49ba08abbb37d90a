"""Materialize the deterministic synthetic eval set for waifu2x.benchmark.

The no-egress build environment has no photo/art eval corpus, so the
quality table in docs/waifu2x.md is measured on a fixed synthetic set
drawn from the same generator families the training pipeline uses
(reference uses held-out art images with its benchmark CLI,
reference waifu2x/benchmark.py:28-90; the synthetic stand-in keeps the
protocol itself — catrom downscale, model/filter upscale, PSNR/Y-PSNR —
bit-identical and reproducible by anyone from this one command).

Seeds are fixed and DISJOINT from training: training samples derive
per-index RNGs from the trainer --seed (nunif_tpu/waifu2x/training/
dataset.py:94), while this set uses the literal seeds below; an exact
seed collision would still differ through the random crop/augment chain.

Usage: python tools/make_eval_set.py [-o /tmp/w2x_eval] [--size 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nunif_tpu.waifu2x.training import generators as G  # noqa: E402

# (name, generator, seed): two draws per family except pure-noise
SPEC = [
    ("screentone_a", G.gen_screentone, 900001),
    ("screentone_b", G.gen_screentone, 900002),
    ("dots_a", G.gen_dot_grid, 900003),
    ("dots_b", G.gen_dot_grid, 900004),
    ("text_a", G.gen_text_image, 900005),
    ("text_b", G.gen_text_image, 900006),
    ("shapes_a", G.gen_shapes, 900007),
    ("shapes_b", G.gen_shapes, 900008),
    ("gradient_a", G.gen_gradient, 900009),
    ("gradient_b", G.gen_gradient, 900010),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="/tmp/w2x_eval")
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()
    os.makedirs(args.output, exist_ok=True)
    for name, fn, seed in SPEC:
        im = fn(size=args.size, seed=seed)
        path = os.path.join(args.output, f"{name}.png")
        im.save(path)
        print(path)


if __name__ == "__main__":
    main()

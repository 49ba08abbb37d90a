"""Synthetic training-image generators (host-side PIL/numpy).

Behavioral parity target: reference waifu2x/training/screentone_generator.py,
dot_generator.py, text_image_generator.py — procedural screentone/halftone,
dot-grid and text-like images mixed into training so the model learns
high-frequency patterns without needing a dataset (also used here to
smoke-test training end-to-end with zero external data).
"""
from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageDraw


def _rand_color(rng, grayscale_p=0.5):
    if rng.random() < grayscale_p:
        v = rng.randint(0, 255)
        return (v, v, v)
    return tuple(rng.randint(0, 255) for _ in range(3))


def gen_screentone(size: int = 640, seed=None) -> Image.Image:
    """Halftone-style dot screen (reference screentone_generator.py)."""
    rng = random.Random(seed)
    bg = _rand_color(rng)
    fg = _rand_color(rng)
    im = Image.new("RGB", (size, size), bg)
    draw = ImageDraw.Draw(im)
    pitch = rng.randint(4, 24)
    radius = max(1, int(pitch * rng.uniform(0.2, 0.45)))
    phase = rng.random() < 0.5
    for yi, y in enumerate(range(-pitch, size + pitch, pitch)):
        offset = (pitch // 2) if (phase and yi % 2 == 1) else 0
        for x in range(-pitch, size + pitch, pitch):
            cx = x + offset
            draw.ellipse((cx - radius, y - radius, cx + radius, y + radius),
                         fill=fg)
    if rng.random() < 0.5:
        im = im.rotate(rng.uniform(-45, 45), resample=Image.BILINEAR,
                       fillcolor=bg)
    return im


def gen_dot_grid(size: int = 640, seed=None) -> Image.Image:
    """1-4px dot/line grid patterns (reference dot_generator.py)."""
    rng = random.Random(seed)
    bg = _rand_color(rng)
    fg = _rand_color(rng)
    im = Image.new("RGB", (size, size), bg)
    draw = ImageDraw.Draw(im)
    cell = rng.randint(2, 8)
    dot = rng.randint(1, max(1, cell // 2))
    kind = rng.choice(["dots", "hlines", "vlines", "checker"])
    for y in range(0, size, cell):
        for x in range(0, size, cell):
            if kind == "dots":
                draw.rectangle((x, y, x + dot - 1, y + dot - 1), fill=fg)
            elif kind == "hlines":
                draw.rectangle((0, y, size, y + dot - 1), fill=fg)
                break
            elif kind == "vlines" and y == 0:
                draw.rectangle((x, 0, x + dot - 1, size), fill=fg)
            elif kind == "checker" and ((x // cell + y // cell) % 2 == 0):
                draw.rectangle((x, y, x + cell - 1, y + cell - 1), fill=fg)
    return im


def gen_text_image(size: int = 640, seed=None) -> Image.Image:
    """Text-like glyph strokes (reference text_image_generator.py, without
    font dependencies: random short strokes and boxes mimic glyph edges)."""
    rng = random.Random(seed)
    bg = _rand_color(rng)
    fg = _rand_color(rng)
    im = Image.new("RGB", (size, size), bg)
    draw = ImageDraw.Draw(im)
    line_h = rng.randint(10, 32)
    stroke = max(1, line_h // 10)
    y = rng.randint(0, line_h)
    while y < size - line_h:
        x = rng.randint(0, line_h)
        while x < size - line_h:
            glyph_w = rng.randint(line_h // 2, line_h)
            n_strokes = rng.randint(2, 6)
            for _ in range(n_strokes):
                x0 = x + rng.randint(0, glyph_w)
                y0 = y + rng.randint(0, line_h)
                x1 = x + rng.randint(0, glyph_w)
                y1 = y + rng.randint(0, line_h)
                draw.line((x0, y0, x1, y1), fill=fg, width=stroke)
            x += glyph_w + stroke * 2
        y += int(line_h * rng.uniform(1.2, 1.8))
    return im


GENERATORS = {
    "screentone": gen_screentone,
    "dot": gen_dot_grid,
    "text": gen_text_image,
}


def gen_random(size: int = 640, seed=None) -> Image.Image:
    rng = random.Random(seed)
    name = rng.choice(list(GENERATORS))
    return GENERATORS[name](size, seed=rng.randint(0, 2 ** 31))

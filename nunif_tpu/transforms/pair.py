"""Host-side paired transforms for training datasets (numpy HWC).

Behavioral parity target: reference nunif/transforms/pair.py — paired
crops keep the (x, y) crop windows aligned through `y_offset` (model
border crop) and `y_scale` (SR factor); hard-example crop picks the
highest-difference window among N samples.

These run on the data-loading host threads (not under jit), so they are
plain numpy with an explicit np.random.Generator.
"""
from __future__ import annotations

import numpy as np


class Identity:
    def __call__(self, rng, x, y):
        return x, y


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, rng, x, y):
        for t in self.transforms:
            x, y = t(rng, x, y)
        return x, y


class RandomApply:
    def __init__(self, transforms, p):
        self.inner = Compose(transforms)
        self.p = p

    def __call__(self, rng, x, y):
        if rng.uniform() > self.p:
            return x, y
        return self.inner(rng, x, y)


class RandomChoice:
    def __init__(self, transforms, p=None):
        self.transforms = transforms
        self.p = p

    def __call__(self, rng, x, y):
        i = rng.choice(len(self.transforms), p=self.p)
        return self.transforms[i](rng, x, y)


def _crop(x, top, left, h, w):
    return x[top:top + h, left:left + w]


class RandomCrop:
    def __init__(self, size, y_offset=0, y_scale=1):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.y_offset = y_offset
        self.y_scale = y_scale

    def __call__(self, rng, x, y):
        h, w = self.size
        H, W = x.shape[:2]
        top = int(rng.integers(0, H - h + 1))
        left = int(rng.integers(0, W - w + 1))
        s, o = self.y_scale, self.y_offset
        yx = _crop(y, top * s + o, left * s + o,
                   h * s - o * 2, w * s - o * 2)
        return _crop(x, top, left, h, w), yx


class CenterCrop:
    def __init__(self, size, y_offset=0, y_scale=1):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.y_offset = y_offset
        self.y_scale = y_scale

    def __call__(self, rng, x, y):
        h, w = self.size
        H, W = x.shape[:2]
        top, left = (H - h) // 2, (W - w) // 2
        s, o = self.y_scale, self.y_offset
        yx = _crop(y, top * s + o, left * s + o,
                   h * s - o * 2, w * s - o * 2)
        return _crop(x, top, left, h, w), yx


class RandomHardExampleCrop:
    """Pick the crop with the largest |x - y| difference among `samples`
    candidates (reference :67-102)."""

    def __init__(self, size, y_offset=0, y_scale=1, samples=4):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.y_offset = y_offset
        self.y_scale = y_scale
        self.samples = samples

    def __call__(self, rng, x, y):
        h, w = self.size
        H, W = x.shape[:2]
        s, o = self.y_scale, self.y_offset
        best, best_score = None, -1.0
        for _ in range(self.samples):
            top = int(rng.integers(0, H - h + 1))
            left = int(rng.integers(0, W - w + 1))
            xc = _crop(x, top, left, h, w)
            yc = _crop(y, top * s + o, left * s + o,
                       h * s - o * 2, w * s - o * 2)
            # score on the x-resolution center region
            xs = xc.astype(np.float32)
            ys = yc.astype(np.float32)
            if xs.shape != ys.shape:
                score = float(np.std(xs))  # fallback when scales differ
            else:
                score = float(np.abs(xs - ys).mean())
            if score > best_score:
                best, best_score = (xc, yc), score
        return best


class RandomFlip:
    """Random rot90 x {0..3} + random h-flip, applied to both."""

    def __call__(self, rng, x, y):
        k = int(rng.integers(0, 4))
        if k:
            x, y = np.rot90(x, k, (0, 1)), np.rot90(y, k, (0, 1))
        if rng.uniform() < 0.5:
            x, y = x[:, ::-1], y[:, ::-1]
        return np.ascontiguousarray(x), np.ascontiguousarray(y)


class RandomHFlip:
    def __call__(self, rng, x, y):
        if rng.uniform() < 0.5:
            x, y = x[:, ::-1], y[:, ::-1]
        return np.ascontiguousarray(x), np.ascontiguousarray(y)

"""cutmix / mixup batch augmentations (host-side numpy or jnp-compatible).

Behavioral parity target: reference nunif/transforms/cutmix.py:50-97 and
mixup.py:14-55 — pair each sample with a shuffled partner; cutmix pastes
a random rectangle (mask ratio in [mask_min, mask_max]), mixup lerps.
"""
from __future__ import annotations

import numpy as np


def mixup(rng, a, b=None, alpha=0.5):
    """a: (B,H,W,C); b defaults to a shuffled a (reference mixup.py:14-33)."""
    if b is None:
        b = a[rng.permutation(a.shape[0])]
    return a * (1.0 - alpha) + b * alpha


def cutmix(rng, a, b=None, mask_min=0.2, mask_max=0.5):
    """Paste a random rect of b into a (reference cutmix.py:50-82)."""
    if b is None:
        b = a[rng.permutation(a.shape[0])]
    B, H, W, C = a.shape
    out = np.array(a, copy=True)
    for i in range(B):
        ratio = rng.uniform(mask_min, mask_max)
        mh, mw = max(1, int(H * ratio)), max(1, int(W * ratio))
        top = int(rng.integers(0, H - mh + 1))
        left = int(rng.integers(0, W - mw + 1))
        out[i, top:top + mh, left:left + mw] = \
            b[i, top:top + mh, left:left + mw]
    return out


class RandomMixup:
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, rng, batch):
        if rng.uniform() < self.p:
            return mixup(rng, batch, alpha=float(rng.uniform(0.0, 1.0)))
        return batch


class RandomCutmix:
    def __init__(self, p=0.1, mask_min=0.2, mask_max=0.5):
        self.p = p
        self.mask_min = mask_min
        self.mask_max = mask_max

    def __call__(self, rng, batch):
        if rng.uniform() < self.p:
            return cutmix(rng, batch, mask_min=self.mask_min,
                          mask_max=self.mask_max)
        return batch

"""Waifu2x runtime — model table + convert pipeline.

Behavioral parity target: reference waifu2x/utils.py:42-297 (Waifu2x class):
lazily loads scale2x/4x + noise(0-3)(+scale) checkpoints from a model dir,
alpha-channel pipeline (border pad, model- or bilinear-upscaled alpha),
8-way TTA, tiled render.

TPU-native: every model slot holds (model, params, TiledRenderer); renders
are cached compiled programs keyed by tile-grid bucket.  fp16 `half()` is
replaced by the bf16 compute policy (always on for TPU).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, DEFAULT_POLICY
from ..core.logger import logger
from ..models import load_model, create_model
from ..utils.tiling import TiledRenderer
from ..utils.alpha import alpha_border_pad
from ..modules.resize import resize
from ..transforms.tta import tta_split, tta_merge

METHODS = ("scale", "scale4x", "noise", "noise_scale", "noise_scale4x")


def default_model_dir() -> Optional[str]:
    """The bundled TPU-native model zoo (models/waifu2x/turbo at the repo
    root): turbo_2x checkpoints trained past the catrom/lanczos baselines
    under the reference's own acceptance protocol (docs/waifu2x.md).
    Returns None when not present (e.g. bare package install) — the
    reference equivalent is its downloaded pretrained dir
    (reference waifu2x/utils.py:42-63)."""
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "models", "waifu2x", "turbo")
    return d if os.path.isdir(d) else None

# model-dir file stems, mirroring the reference naming convention
_FILE_STEMS = {
    ("scale", None): "scale2x",
    ("scale4x", None): "scale4x",
    **{("noise", n): f"noise{n}" for n in range(4)},
    **{("noise_scale", n): f"noise{n}_scale2x" for n in range(4)},
    **{("noise_scale4x", n): f"noise{n}_scale4x" for n in range(4)},
}

CHECKPOINT_EXT = ".nztm"


class Waifu2x:
    def __init__(self, model_dir: str, policy: Policy = DEFAULT_POLICY,
                 mesh=None):
        """``mesh``: optional dp mesh — every renderer shards its tile
        minibatch over it (the reference data-parallelizes inference when
        --gpu lists several ids, nunif/models/register.py:44-49)."""
        self.model_dir = model_dir
        self.policy = policy
        self.mesh = mesh
        self._slots = {}  # (method, noise_level) -> (model, params, renderer)

    # ------------------------------------------------------------- loading
    def model_path(self, method: str, noise_level: Optional[int]) -> str:
        stem = _FILE_STEMS[(method, noise_level)]
        return os.path.join(self.model_dir, stem + CHECKPOINT_EXT)

    def has_model_file(self, method: str, noise_level: Optional[int]) -> bool:
        return os.path.exists(self.model_path(method, noise_level))

    def load_model(self, method: str, noise_level: Optional[int] = None):
        key = (method, noise_level if method.startswith("noise") else None)
        if key in self._slots:
            return self._slots[key]
        path = self.model_path(*key)
        model, params, _meta = load_model(path)
        renderer = TiledRenderer(model, params, policy=self.policy,
                                 mesh=self.mesh)
        self._slots[key] = (model, params, renderer)
        logger.debug("waifu2x: loaded %s for %s", path, key)
        return self._slots[key]

    def load_model_all(self, load_4x: bool = True):
        for (method, noise), _stem in _FILE_STEMS.items():
            if not load_4x and method.endswith("4x"):
                continue
            if self.has_model_file(method, noise):
                self.load_model(method, noise)

    def set_slot(self, method: str, noise_level, model, params):
        """Install an in-memory model (tests / random init / converted)."""
        key = (method, noise_level if method.startswith("noise") else None)
        self._slots[key] = (model, params,
                            TiledRenderer(model, params, policy=self.policy,
                                          mesh=self.mesh))

    # ----------------------------------------------------------- rendering
    def render(self, x, method: str, noise_level: Optional[int] = None,
               tile_size=None, batch_size=None):
        model, _params, renderer = self.load_model(method, noise_level)
        return renderer.render(x, tile_size=tile_size, batch_size=batch_size)

    def convert(self, x, alpha=None, method: str = "scale",
                noise_level: Optional[int] = None,
                tile_size=None, batch_size=None, tta: bool = False):
        """x: (H, W, 3) float32 [0,1]; alpha: (H, W, 1) or None.
        Returns (rgb, alpha) at output scale."""
        assert method in METHODS
        if method not in ("scale", "scale4x"):
            assert noise_level is not None and 0 <= noise_level < 4
        model, _params, renderer = self.load_model(method, noise_level)

        x = jnp.asarray(x, jnp.float32)
        blank_alpha = alpha is None or bool(jnp.all(alpha >= 1.0))
        if alpha is not None and not blank_alpha:
            x = alpha_border_pad(x, jnp.asarray(alpha, jnp.float32),
                                 int(model.i2i_offset))

        if tta:
            outs = [renderer.render(xx, tile_size=tile_size,
                                    batch_size=batch_size)
                    for xx in tta_split(x)]
            rgb = tta_merge(outs)
        else:
            rgb = renderer.render(x, tile_size=tile_size, batch_size=batch_size)

        out_alpha = None
        if alpha is not None:
            scale = int(model.i2i_scale)
            h, w = alpha.shape[0] * scale, alpha.shape[1] * scale
            if scale == 1:
                out_alpha = jnp.asarray(alpha, jnp.float32)
            elif not blank_alpha:
                # upscale alpha with the scale model when available
                skey = ("scale4x", None) if method.endswith("4x") else ("scale", None)
                if skey in self._slots or self.has_model_file(*skey):
                    smodel, _p, srenderer = self.load_model(*skey)
                    a3 = jnp.repeat(jnp.asarray(alpha, jnp.float32), 3, axis=-1)
                    ua = srenderer.render(a3, tile_size=tile_size,
                                          batch_size=batch_size)
                    out_alpha = jnp.mean(ua, axis=-1, keepdims=True)
                else:
                    out_alpha = resize(jnp.asarray(alpha, jnp.float32), h, w,
                                       mode="bilinear", antialias=False)
            else:
                out_alpha = jnp.ones((h, w, 1), jnp.float32)
        return rgb, out_alpha

    def warmup(self, methods=None, tile_size=None, batch_size=None):
        """Pre-compile render programs (reference: waifu2x/utils.py:60-79)."""
        for key in (methods or list(self._slots)):
            model, _params, renderer = self._slots[key]
            t = model.find_valid_tile_size(tile_size)
            dummy = jnp.zeros((t, t, 3), jnp.float32)
            jax.block_until_ready(
                renderer.render(dummy, tile_size=t, batch_size=batch_size))

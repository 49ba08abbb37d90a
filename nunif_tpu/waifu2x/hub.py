"""waifu2x hub API — pip-less one-call model access.

Behavioral parity target: reference waifu2x/hub.py:10-31 + hubconf.py:16 —
``waifu2x(model_type=..., method=..., noise_level=...)`` returns a
`Waifu2xImageModel` that converts PIL images / numpy arrays directly.
The torch.hub URL download is replaced by a local model-dir convention
(zero-egress environments); converted checkpoints drop into
``<model_root>/<model_type>/``.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.logger import logger
from .runtime import Waifu2x, METHODS

DEFAULT_MODEL_ROOT = os.environ.get(
    "NUNIF_TPU_MODEL_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "nunif_tpu", "waifu2x"))

MODEL_TYPES = ("art", "art_scan", "photo", "cunet/art", "swin_unet/art",
               "swin_unet/photo", "upconv_7/art", "upconv_7/photo",
               "turbo")  # bundled TPU-native trained models


class Waifu2xImageModel:
    """PIL-facing wrapper (reference waifu2x/hub.py Waifu2xImageModel)."""

    def __init__(self, model_type: str = "art", model_dir: Optional[str] = None,
                 tile_size=None, batch_size=None, tta=False,
                 keep_alpha=True, method: str = "scale",
                 noise_level: Optional[int] = None):
        self.model_type = model_type
        self.method = method
        self.noise_level = noise_level
        self.model_dir = model_dir or os.path.join(
            DEFAULT_MODEL_ROOT, model_type.replace("/", "_"))
        if model_dir is None and not os.path.isdir(self.model_dir):
            # bundled TPU-native trained zoo (runtime.default_model_dir):
            # serves model_type "turbo" and is the fallback when the
            # user's model root has nothing for the requested type
            from .runtime import default_model_dir
            bundled = default_model_dir()
            if bundled is not None:
                self.model_dir = bundled
        self.tile_size = tile_size
        self.batch_size = batch_size
        self.tta = tta
        self.keep_alpha = keep_alpha
        self.w2x = Waifu2x(self.model_dir)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, im, method: Optional[str] = None,
                noise_level: Optional[int] = None):
        """im: PIL.Image or HWC float array -> same kind."""
        method = method or self.method
        noise_level = self.noise_level if noise_level is None else noise_level
        from PIL import Image
        is_pil = isinstance(im, Image.Image)
        if is_pil:
            src = im
            if src.mode not in ("RGB", "RGBA"):
                src = src.convert("RGBA" if "A" in src.mode else "RGB")
            x = np.asarray(src, np.float32) / 255.0
        else:
            x = np.asarray(im, np.float32)
        alpha = None
        if x.shape[-1] == 4:
            alpha = x[..., 3:4] if self.keep_alpha else None
            x = x[..., :3]
        rgb, out_alpha = self.w2x.convert(
            x, alpha, method=method, noise_level=noise_level,
            tile_size=self.tile_size, batch_size=self.batch_size,
            tta=self.tta)
        rgb = np.asarray(rgb)
        if out_alpha is not None:
            rgb = np.concatenate([rgb, np.asarray(out_alpha)], axis=-1)
        if is_pil:
            return Image.fromarray(
                (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8))
        return rgb

    # convenience, mirrors the reference method names
    def scale(self, im):
        return self.convert(im, method="scale")

    def denoise(self, im, noise_level: int = 1):
        return self.convert(im, method="noise", noise_level=noise_level)

    def scale_denoise(self, im, noise_level: int = 1):
        return self.convert(im, method="noise_scale", noise_level=noise_level)


def waifu2x(model_type: str = "art", model_dir: Optional[str] = None,
            tile_size=None, batch_size=None, tta=False, keep_alpha=True,
            method: str = "scale", noise_level: Optional[int] = None,
            **kwargs) -> Waifu2xImageModel:
    """reference hubconf.py:16."""
    return Waifu2xImageModel(model_type=model_type, model_dir=model_dir,
                             tile_size=tile_size, batch_size=batch_size,
                             tta=tta, keep_alpha=keep_alpha,
                             method=method, noise_level=noise_level)


superresolution = waifu2x
denoise = waifu2x

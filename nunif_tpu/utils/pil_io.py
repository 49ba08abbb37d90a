"""Image I/O via PIL (reference: nunif/utils/pil_io.py:172-326).

Loads to float32 HWC numpy in [0,1]; handles alpha, 16-bit PNG, ICC->sRGB,
EXIF rotation.  Host-side only — not on the hot path (video I/O is the
native C++ service in nunif_tpu/utils/video.py).
"""
from __future__ import annotations

import io
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageCms, ImageOps

Image.MAX_IMAGE_PIXELS = None


class ImageMeta:
    def __init__(self, mode=None, icc_profile=None, bit_depth=8, filename=None):
        self.mode = mode
        self.icc_profile = icc_profile
        self.bit_depth = bit_depth
        self.filename = filename


def _to_srgb(im: Image.Image) -> Image.Image:
    icc = im.info.get("icc_profile")
    if not icc:
        return im
    try:
        src = ImageCms.ImageCmsProfile(io.BytesIO(icc))
        dst = ImageCms.createProfile("sRGB")
        return ImageCms.profileToProfile(im, src, dst, outputMode=im.mode)
    except Exception:
        return im


def load_image(path_or_file, color: str = "rgb", keep_alpha: bool = True,
               exif_transpose: bool = True) -> Tuple[np.ndarray, ImageMeta]:
    """Return (HWC float32 [0,1], meta). Alpha kept as 4th channel if present."""
    im = Image.open(path_or_file)
    im.load()
    meta = ImageMeta(mode=im.mode,
                     icc_profile=im.info.get("icc_profile"),
                     filename=getattr(path_or_file, "name", None)
                     if not isinstance(path_or_file, (str, os.PathLike)) else str(path_or_file))
    if exif_transpose:
        im = ImageOps.exif_transpose(im)

    if im.mode in ("I", "I;16", "I;16B", "I;16L"):
        arr = np.asarray(im, dtype=np.float32)
        arr = arr / 65535.0
        meta.bit_depth = 16
        x = np.stack([arr] * 3, axis=-1) if color == "rgb" else arr[..., None]
        return np.clip(x, 0.0, 1.0), meta

    has_alpha = im.mode in ("RGBA", "LA", "PA") or "transparency" in im.info
    if has_alpha and keep_alpha:
        im = im.convert("RGBA")
        im = _to_srgb(im)
        arr = np.asarray(im, dtype=np.float32) / 255.0
        if color == "gray":
            rgb = arr[..., :3] @ np.array([0.299, 0.587, 0.114], np.float32)
            arr = np.concatenate([rgb[..., None], arr[..., 3:4]], axis=-1)
        return arr, meta
    target = "RGB" if color == "rgb" else "L"
    im = im.convert(target)
    im = _to_srgb(im)
    arr = np.asarray(im, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr, meta


def to_pil(x: np.ndarray, bit_depth: int = 8) -> Image.Image:
    x = np.asarray(x)
    x = np.clip(x, 0.0, 1.0)
    if x.ndim == 3 and x.shape[-1] == 1:
        x = x[..., 0]
    if bit_depth == 16 and (x.ndim == 2):
        return Image.fromarray((x * 65535.0 + 0.5).astype(np.uint16), mode="I;16")
    u8 = (x * 255.0 + 0.5).astype(np.uint8)
    if u8.ndim == 2:
        return Image.fromarray(u8, mode="L")
    if u8.shape[-1] == 4:
        return Image.fromarray(u8, mode="RGBA")
    return Image.fromarray(u8, mode="RGB")


def save_image(x: np.ndarray, path: str, meta: Optional[ImageMeta] = None,
               format: Optional[str] = None, **kwargs):
    im = to_pil(x, bit_depth=(meta.bit_depth if meta else 8))
    params = dict(kwargs)
    if meta and meta.icc_profile:
        params.setdefault("icc_profile", meta.icc_profile)
    tmp = path + ".tmp"
    ext = os.path.splitext(path)[1].lower()
    fmt = format or {"": "PNG", ".png": "PNG", ".jpg": "JPEG", ".jpeg": "JPEG",
                     ".webp": "WEBP", ".bmp": "BMP", ".tif": "TIFF", ".tiff": "TIFF"}.get(ext, "PNG")
    if fmt == "JPEG" and im.mode == "RGBA":
        im = im.convert("RGB")
    im.save(tmp, format=fmt, **params)
    os.replace(tmp, path)


def encode_image(x: np.ndarray, format: str = "PNG", **kwargs) -> bytes:
    buf = io.BytesIO()
    im = to_pil(x)
    if format.upper() == "JPEG" and im.mode == "RGBA":
        im = im.convert("RGB")
    im.save(buf, format=format, **kwargs)
    return buf.getvalue()


def decode_image(data: bytes, **kwargs):
    return load_image(io.BytesIO(data), **kwargs)

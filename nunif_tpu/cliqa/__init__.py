"""cliqa — low-vision image-quality scoring for dataset filtering.

Capability parity target: reference cliqa/ (SURVEY.md §2.5): patch-based
JPEG-quality / grain-noise-PSNR / resize-quality predictors + filter CLIs.
"""
from . import models  # noqa: F401 — register
from .utils import (
    extract_patches, predict_jpeg_quality, predict_grain_noise_psnr,
    predict_resize_quality,
)

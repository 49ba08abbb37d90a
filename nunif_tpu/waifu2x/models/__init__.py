from .upconv_7 import UpConv7, VGG7
from .swin_unet import (
    SwinUNet, SwinUNet2x, SwinUNet4x, SwinUNet8x, SwinUNetDownscaled,
)

__all__ = [
    "UpConv7", "VGG7",
    "SwinUNet", "SwinUNet2x", "SwinUNet4x", "SwinUNet8x", "SwinUNetDownscaled",
]

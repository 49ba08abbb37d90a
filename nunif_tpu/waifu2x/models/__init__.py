from .upconv_7 import UpConv7, VGG7
from .swin_unet import (
    SwinUNet, SwinUNet2x, SwinUNet4x, SwinUNet8x, SwinUNetDownscaled,
)
from .cunet import CUNet, UpCUNet
from .swin_unet_v2 import (
    SwinUNet1xV2, SwinUNet2xV2, SwinUNet4xV2, SwinUNetV2Downscaled,
)
from .wgmlp import WGMLP4x
from .turbo import Turbo2x, Turbo4x
from .discriminator import (
    L3Discriminator, V1Discriminator, L3V1Discriminator,
    L3ConditionalDiscriminator, V1ConditionalDiscriminator,
    L3V1ConditionalDiscriminator,
)

__all__ = [
    "UpConv7", "VGG7",
    "SwinUNet", "SwinUNet2x", "SwinUNet4x", "SwinUNet8x", "SwinUNetDownscaled",
    "CUNet", "UpCUNet", "Turbo2x",
    "SwinUNet1xV2", "SwinUNet2xV2", "SwinUNet4xV2", "SwinUNetV2Downscaled",
]

from .upconv_7 import UpConv7, VGG7

__all__ = ["UpConv7", "VGG7"]

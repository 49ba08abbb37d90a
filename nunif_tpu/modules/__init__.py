from .pad import (
    replication_pad2d, reflection_pad2d, zero_pad2d, constant_pad2d, crop2d, pad2d,
)
from .color import rgb_to_y, rgb_to_ycbcr, ycbcr_to_rgb
from .permute import (
    pixel_shuffle, pixel_unshuffle, window_partition, window_reverse,
)
from .norm import LayerNormNoBias, RMSNorm, l2_normalize
from .conv import ConvTranspose2dTorch, leaky_relu
from .resize import resize, scale_by, resize_matrix
from .attention import (
    ShiftedWindowAttention, SwinTransformerBlock, SwinTransformerBlocks, SEBlock,
)
from . import losses

"""Pallas TPU kernels for the hot ops."""
from .swin_attention import fused_window_attention

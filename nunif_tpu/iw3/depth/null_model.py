"""Dummy depth model (benchmark / RGBD passthrough).

Behavioral parity target: reference iw3/null_depth_model.py — resize to a
square resolution + grayscale.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...modules.resize import resize
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel


class NullDepthModel(BaseDepthModel):
    def __init__(self, model_type="NULL"):
        super().__init__(model_type)
        self.resolution = 392

    @classmethod
    def get_name(cls):
        return "NullDepth"

    @classmethod
    def supported(cls, model_type):
        return model_type == "NULL"

    def is_metric(self):
        return False

    @property
    def metric_depth(self):
        return False

    def load_model(self, model_type, resolution=None, **kwargs):
        self.resolution = resolution or 392
        return "null", {}

    def infer(self, x, tta=False, low_vram=False, enable_amp=True,
              edge_dilation=0, **kwargs):
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        d = resize(x, self.resolution, self.resolution,
                   mode="bilinear", antialias=False)
        d = jnp.mean(d, axis=-1, keepdims=True)
        if edge_dilation_is_enabled(edge_dilation):
            d = dilate_edge(d, edge_dilation)
        if not batch:
            d = d[0]
        return d

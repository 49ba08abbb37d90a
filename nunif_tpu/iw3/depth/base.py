"""Depth model abstraction.

Behavioral parity target: reference iw3/base_depth_model.py:30-246 —
lifecycle, EMA min-max normalization hooks (enable/disable/reset/flush),
16-bit depth PNG save/load with min/max metadata.

JAX re-design: ``load`` keeps (model, params) instead of a mutable torch
module; compile == jit caching keyed by input bucket (no explicit
compile/uncompile dance needed).
"""
from __future__ import annotations

from abc import ABCMeta, abstractmethod

import numpy as np
import jax.numpy as jnp

from ..depth_scaler import EMAMinMaxScaler


class BaseDepthModel(metaclass=ABCMeta):
    def __init__(self, model_type):
        self.model = None
        self.params = None
        self.model_type = model_type
        self.scaler = self.create_depth_scaler()
        self.limit_resolution = False

    def create_depth_scaler(self):
        return EMAMinMaxScaler(decay=0, buffer_size=1)

    def loaded(self):
        return self.model is not None

    @classmethod
    @abstractmethod
    def get_name(cls):
        ...

    @classmethod
    @abstractmethod
    def supported(cls, model_type):
        ...

    @abstractmethod
    def is_metric(self):
        ...

    def is_image_supported(self):
        return True

    def is_video_supported(self):
        return True

    @abstractmethod
    def load_model(self, model_type, resolution=None, **kwargs):
        ...

    def load(self, resolution=None, limit_resolution=False, **kwargs):
        self.limit_resolution = limit_resolution
        self.model, self.params = self.load_model(
            self.model_type, resolution=resolution, **kwargs)
        return self

    @abstractmethod
    def infer(self, x, **kwargs):
        ...

    # --- DepthAA post-filter (reference iw3 --depth-aa) ---
    def set_depth_aa(self, model, params):
        self._depth_aa = (model, params)

    def apply_depth_aa(self, depth):
        if getattr(self, "_depth_aa", None) is None:
            return depth
        from ..models.depth_aa import depth_aa_infer
        m, p = self._depth_aa
        return depth_aa_infer(m, p, depth)

    # --- EMA normalization hooks (reference :154-196) ---
    def enable_ema(self, decay, buffer_size=None):
        self.scaler.reset(decay=decay, buffer_size=buffer_size)

    def get_ema_state(self):
        return self.scaler.decay, self.scaler.buffer_size

    def disable_ema(self):
        self.scaler.reset(decay=0, buffer_size=1)

    def reset_ema(self, decay=None, buffer_size=None):
        self.scaler.reset(decay=decay, buffer_size=buffer_size)

    def reset_state(self):
        pass

    def reset(self):
        self.reset_ema()
        self.reset_state()

    def get_ema_buffer_size(self):
        return self.scaler.buffer_size

    def minmax_normalize_chw(self, depth, return_minmax=False):
        return self.scaler(depth, return_minmax=return_minmax)

    def flush_minmax_normalize(self, return_minmax=False):
        return self.scaler.flush(return_minmax=return_minmax)

    def minmax_normalize(self, depth, reset_ema=None):
        """depth: (B,H,W,1); returns list of normalized frames
        (reference :183-196).  One device->host sync per batch."""
        assert depth.ndim == 4
        if reset_ema is not None:
            assert len(reset_ema) == depth.shape[0]
        return self.scaler.update_batch(depth, reset_flags=reset_ema)

    # --- 16-bit depth PNG round trip (reference :198-238) ---
    @staticmethod
    def save_normalized_depth(depth, file_path, png_info=None,
                              min_depth_value=None, max_depth_value=None):
        from PIL import Image
        from PIL.PngImagePlugin import PngInfo
        png_info = dict(png_info or {})
        if min_depth_value is not None:
            png_info["iw3_min_depth_value"] = float(min_depth_value)
        if max_depth_value is not None:
            png_info["iw3_max_depth_value"] = float(max_depth_value)
        depth = np.asarray(jnp.clip(depth, 0, 1))
        if depth.ndim == 3:
            depth = depth[..., 0]
        depth_int = (depth * 0xFFFF).astype(np.uint16)
        metadata = PngInfo()
        for k, v in png_info.items():
            metadata.add_text(k, str(v))
        Image.fromarray(depth_int).save(file_path, pnginfo=metadata)

    @staticmethod
    def load_depth(file_path):
        from PIL import Image
        with Image.open(file_path) as im:
            text = getattr(im, "text", {}) or {}
            min_v = max_v = None
            if "iw3_min_depth_value" in text and "iw3_max_depth_value" in text:
                try:
                    min_v = float(text["iw3_min_depth_value"])
                    max_v = float(text["iw3_max_depth_value"])
                except (ValueError, TypeError):
                    min_v = max_v = None
            arr = np.asarray(im)
            if arr.dtype == np.uint16:
                depth = np.clip(arr.astype(np.float32) / 0xFFFF, 0, 1)
            elif arr.dtype == np.uint8:
                depth = arr.astype(np.float32) / 255.0
            else:
                depth = arr.astype(np.float32)
            if depth.ndim == 3:
                depth = depth.mean(axis=-1)
            depth = depth[..., None]  # HWC
            if min_v is not None and max_v is not None:
                depth = depth * (max_v - min_v) + min_v
            metadata = dict(text)
            metadata["filename"] = file_path
            return jnp.asarray(depth), metadata

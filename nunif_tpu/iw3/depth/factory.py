"""Depth backend factory (reference iw3/depth_model_factory.py:10-33).

Implemented backends: DepthAnything (v1/v2/metric/distill table),
VideoDepthAnything (windowed online + per-frame streaming), ZoeDepth
(N/K/NK + ZoeD_Any), DepthPro, and NULL.
"""
from __future__ import annotations

from .depth_anything import DepthAnythingModel, NAME_MAP as _DA_NAMES
from .null_model import NullDepthModel
from .vda import (
    VideoDepthAnythingModel, VideoDepthAnythingStreamingModel,
    NAME_MAP as _VDA_NAMES, STREAM_NAME_MAP as _VDA_STREAM_NAMES,
)
from .zoedepth import ZoeDepthModel, MODEL_TYPES as _ZOE_NAMES
from .depth_pro import DepthProModel, NAME_MAP as _PRO_NAMES
from .da3 import DepthAnythingV3MonoModel, NAME_MAP as _DA3_NAMES

# reference iw3/README.md model table
DEPTH_MODEL_TYPES = (list(_DA_NAMES) + ["NULL"] + list(_VDA_NAMES)
                     + list(_VDA_STREAM_NAMES) + list(_ZOE_NAMES)
                     + list(_PRO_NAMES) + list(_DA3_NAMES))


def create_depth_model(model_type: str, **kwargs):
    if DepthAnythingModel.supported(model_type):
        return DepthAnythingModel(model_type)
    if VideoDepthAnythingModel.supported(model_type):
        return VideoDepthAnythingModel(model_type, **kwargs)
    if VideoDepthAnythingStreamingModel.supported(model_type):
        return VideoDepthAnythingStreamingModel(model_type, **kwargs)
    if ZoeDepthModel.supported(model_type):
        return ZoeDepthModel(model_type)
    if DepthProModel.supported(model_type):
        return DepthProModel(model_type)
    if DepthAnythingV3MonoModel.supported(model_type):
        return DepthAnythingV3MonoModel(model_type, **kwargs)
    if NullDepthModel.supported(model_type):
        return NullDepthModel(model_type)
    raise ValueError(f"{model_type} is not supported")

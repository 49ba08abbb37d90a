"""Depth backend factory (reference iw3/depth_model_factory.py:10-33).

Currently implemented backends: DepthAnything (v1/v2/metric/distill table)
and NULL.  ZoeDepth / DepthPro / VideoDepthAnything types are declared so
the CLI surface matches; they raise a clear error until their encoders
land.
"""
from __future__ import annotations

from .depth_anything import DepthAnythingModel, NAME_MAP as _DA_NAMES
from .null_model import NullDepthModel

# reference iw3/README.md model table
ZOEDEPTH_TYPES = ["ZoeD_N", "ZoeD_K", "ZoeD_NK", "ZoeD_Any_N", "ZoeD_Any_K"]
DEPTH_PRO_TYPES = ["DepthPro", "DepthPro_S"]
VDA_TYPES = ["VDA_S", "VDA_L", "VDA_Metric", "VDA_Stream_S", "VDA_Stream_L"]

DEPTH_MODEL_TYPES = (list(_DA_NAMES) + ["NULL"] + ZOEDEPTH_TYPES
                     + DEPTH_PRO_TYPES + VDA_TYPES)


def create_depth_model(model_type: str):
    if DepthAnythingModel.supported(model_type):
        return DepthAnythingModel(model_type)
    if NullDepthModel.supported(model_type):
        return NullDepthModel(model_type)
    if model_type in ZOEDEPTH_TYPES + DEPTH_PRO_TYPES + VDA_TYPES:
        raise NotImplementedError(
            f"depth model {model_type} is declared but its TPU port has not "
            f"landed yet; use one of {sorted(_DA_NAMES)} or NULL")
    raise ValueError(f"{model_type} is not supported")

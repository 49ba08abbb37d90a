"""Loader for original lua-waifu2x JSON weight files.

Behavioral parity target: reference waifu2x/models/json_model.py:7-33 +
json2pth.py — the JSON is a flat list of layer params in network order
({class_name, weight, bias}); they are poured into the model's conv
layers in definition order.

Layout conversion: lua/torch conv weights are OIHW; flax Conv kernels are
HWIO.  SpatialFullConvolution (deconv) weights are IOHW and additionally
need a spatial flip for our dilated-conv formulation of ConvTranspose2d
(see modules/conv.py ConvTranspose2dTorch).
"""
from __future__ import annotations

import json
import re

import numpy as np

from ...core.logger import logger


def _layer_order(params: dict):
    """Conv_0..Conv_N then ConvTranspose*_i, numerically sorted — flax
    auto-names follow definition order for upconv_7 / vgg_7."""
    def key(name):
        m = re.match(r"(.*?)_(\d+)$", name)
        base, idx = (m.group(1), int(m.group(2))) if m else (name, 0)
        group = 0 if base == "Conv" else 1
        return (group, idx)
    return sorted(params.keys(), key=key)


def load_params_from_waifu2x_json(model, params, json_file,
                                  skip_upsample_weight=False):
    """Fill ``params`` (flax dict for waifu2x.upconv_7 / vgg_7) from a
    lua-waifu2x JSON file.  Returns the new params dict."""
    with open(json_file, "r") as f:
        layers = json.load(f)
    out = {k: dict(v) for k, v in params.items()}
    names = _layer_order(params)
    li = 0
    for name in names:
        layer = layers[li]
        li += 1
        if (skip_upsample_weight
                and "SpatialFullConvolution" in layer.get("class_name", "")
                and "weight" in layer):
            w = np.asarray(layer["weight"], np.float32)
            if w.ndim == 4 and w.shape[2] == 2 and w.shape[3] == 2:
                logger.debug("skip upsample weight %s", w.shape)
                layer = layers[li]
                li += 1
        kernel = out[name]["kernel"]
        if "weight" in layer:
            w = np.asarray(layer["weight"], np.float32)
            if name.startswith("ConvTranspose"):
                # torch deconv weight (I, O, kh, kw) -> flipped HWIO
                w = w.reshape(w.shape[0], w.shape[1], w.shape[-2], w.shape[-1])
                w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                # (O, I, kh, kw) -> HWIO
                w = w.reshape(-1, *np.shape(w)[1:])
                w = w.transpose(2, 3, 1, 0)
            assert w.shape == kernel.shape, (name, w.shape, kernel.shape)
            out[name]["kernel"] = w.copy()
        if "bias" in layer and "bias" in out[name]:
            b = np.asarray(layer["bias"], np.float32).reshape(-1)
            out[name]["bias"] = b
    logger.debug("json_model: %d layers read, %d written", len(layers), li)
    return out


def load_json_model(json_file, arch=None):
    """Create the matching model and load JSON weights.

    arch: waifu2x.upconv_7 or waifu2x.vgg_7; guessed from the layer count
    when omitted (upconv_7 ends with SpatialFullConvolution).
    """
    import jax
    from ...models import create_model
    with open(json_file, "r") as f:
        layers = json.load(f)
    if arch is None:
        last = layers[-1].get("class_name", "")
        arch = ("waifu2x.upconv_7" if "FullConvolution" in last
                else "waifu2x.vgg_7")
    model = create_model(arch)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = load_params_from_waifu2x_json(model, params, json_file)
    return model, params

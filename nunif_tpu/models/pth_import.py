"""Direct loading of reference .pth checkpoints: load -> convert -> cache.

The reference saves self-describing checkpoints
``{"nunif_model": 1, "name": ..., "kwargs": ..., "state_dict": ...}``
(reference nunif/models/utils.py:15-74).  ``load_torch_model`` reads one,
dispatches to the matching torch->flax converter and returns the flax
(model, params, meta) triple; the result is cached next to the file as a
``.nztm`` so subsequent loads skip torch entirely.

This is the "no code path logs random-init when given a reference
checkpoint" requirement: every converter here is numerically validated in
tests/test_*_convert.py.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.logger import logger
from . import torch_convert as tc
from .register import create_model

# name -> (converter(state_dict, kwargs) -> params, create_kwargs(kwargs))


def _swin_unet(sd, kwargs):
    name = kwargs["__name"]
    scale = {"waifu2x.swin_unet_1x": 1, "waifu2x.swin_unet_2x": 2,
             "waifu2x.swin_unet_4x": 4, "waifu2x.swin_unet_4xl": 4,
             "waifu2x.swin_unet_8x": 8}[name]
    base_dim = kwargs.get("base_dim", 192 if name.endswith("4xl") else 96)
    return tc.convert_swin_unet(sd, base_dim=base_dim, base_layers=2,
                                scale_factor=scale)


def _model_kwargs(kwargs, keep=()):
    return {k: v for k, v in kwargs.items() if k in keep}


_IMPORTERS = {
    "waifu2x.upconv_7": (lambda sd, kw: tc.convert_upconv7(sd), ()),
    "waifu2x.vgg_7": (lambda sd, kw: tc.convert_vgg7(sd), ()),
    "waifu2x.swin_unet_1x": (_swin_unet, ("base_dim", "layer_norm")),
    "waifu2x.swin_unet_2x": (_swin_unet, ("base_dim", "layer_norm")),
    "waifu2x.swin_unet_4x": (_swin_unet,
                             ("base_dim", "layer_norm", "pre_antialias")),
    "waifu2x.swin_unet_4xl": (_swin_unet, ()),
    "waifu2x.swin_unet_8x": (_swin_unet, ()),
    "waifu2x.swin_unet_v2_1x": (
        lambda sd, kw: tc.convert_swin_unet_v2(
            sd, first_layers=kw.get("first_layers", 2),
            last_layers=kw.get("last_layers", 3)),
        ("base_dim", "lv1_mlp_ratio", "lv2_mlp_ratio", "lv2_ratio",
         "first_layers", "last_layers")),
    "waifu2x.swin_unet_v2_2x": (
        lambda sd, kw: tc.convert_swin_unet_v2(sd),
        ("base_dim", "lv1_mlp_ratio", "lv2_mlp_ratio", "lv2_ratio")),
    "waifu2x.swin_unet_v2_4x": (
        lambda sd, kw: tc.convert_swin_unet_v2(sd),
        ("base_dim", "lv1_mlp_ratio", "lv2_mlp_ratio", "lv2_ratio")),
    "waifu2x.cunet": (lambda sd, kw: tc.convert_cunet(sd, scale=1), ()),
    "waifu2x.upcunet": (lambda sd, kw: tc.convert_cunet(sd, scale=2), ()),
    "waifu2x.wgmlp_4x": (lambda sd, kw: tc.convert_wgmlp(sd),
                         ("base_dim", "lv1_mlp_ratio", "lv2_mlp_ratio")),
    "sbs.row_flow_v2": (lambda sd, kw: tc.convert_row_flow_v2(sd), ()),
    "sbs.row_flow_v3": (lambda sd, kw: tc.convert_row_flow_v3(sd), ()),
    "sbs.mlbw": (
        lambda sd, kw: tc.convert_mlbw(sd, small=kw.get("small", False)),
        ("num_layers", "base_dim", "small", "hole_mask")),
    "inpaint.light_inpaint_v1": (
        lambda sd, kw: tc.convert_light_inpaint_v1(sd), ()),
    "inpaint.light_video_inpaint_v1": (
        lambda sd, kw: tc.convert_light_video_inpaint_v1(sd),
        ("base_dim", "lv2_mlp_ratio")),
    "inpaint.light_video_inpaint_v1_medium": (
        lambda sd, kw: tc.convert_light_video_inpaint_v1(sd),
        ("base_dim", "lv2_mlp_ratio")),
    "inpaint.light_video_inpaint_v1_large": (
        lambda sd, kw: tc.convert_light_video_inpaint_v1(sd),
        ("base_dim", "lv2_mlp_ratio")),
    "iw3.depth_aa": (lambda sd, kw: tc.convert_depth_aa(sd), ()),
    "iw3.sod_v1": (lambda sd, kw: tc.convert_u2netp(sd, prefix="u2netp."),
                   ()),
    "cliqa.jpeg_quality": (
        lambda sd, kw: tc.convert_cliqa(
            sd, ["quality_output", "subsampling_output"]), ()),
    "cliqa.grain_noise_level": (
        lambda sd, kw: tc.convert_cliqa(sd, ["noise_level_output"]), ()),
    "cliqa.scale_factor": (
        lambda sd, kw: tc.convert_cliqa(sd, ["scale_factor_output"]), ()),
    "stlizer.light_outpaint_v1": (
        lambda sd, kw: tc.convert_light_outpaint_v1(sd), ()),
}

# reference aliases -> canonical importer names
_ALIASES = {
    "waifu2x.winc_unet_1x": "waifu2x.swin_unet_v2_1x",
    "waifu2x.winc_unet_2x": "waifu2x.swin_unet_v2_2x",
    "waifu2x.winc_unet_4x": "waifu2x.swin_unet_v2_4x",
    "waifu2x.swin_unet_1x_v2": "waifu2x.swin_unet_v2_1x",
    "inpaint.light_video_inpaint_v1_small": "inpaint.light_video_inpaint_v1",
    "iw3.dsod_v1": "iw3.sod_v1",
    "sbs.mlbw_l2": "sbs.mlbw",
    "sbs.mlbw_l4": "sbs.mlbw",
    "sbs.mlbw_l2s": "sbs.mlbw",
    "sbs.mlbw_l4s": "sbs.mlbw",
    "sbs.mask_mlbw_l2": "sbs.mlbw",
}

# extra create_model kwargs per canonical name
_EXTRA_KWARGS = {
    "cliqa.jpeg_quality": {"norm": "none"},
    "cliqa.grain_noise_level": {"norm": "none"},
    "cliqa.scale_factor": {"norm": "none"},
}


def supported_torch_models():
    return sorted(set(_IMPORTERS) | set(_ALIASES))


def load_torch_checkpoint(path: str):
    """Read a reference .pth/.safetensors and return
    (name, kwargs, state_dict)."""
    import torch
    if str(path).endswith(".safetensors"):
        from safetensors.torch import load_file
        data = load_file(path)
    else:
        data = torch.load(path, weights_only=True, map_location="cpu")
    if isinstance(data, dict) and "state_dict" in data:
        name = data.get("name")
        kwargs = data.get("kwargs") or {}
        sd = data["state_dict"]
    else:
        name, kwargs, sd = None, {}, data
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    return name, kwargs, sd


def convert_torch_state(name: str, kwargs: dict, sd: dict):
    """Convert a reference state_dict to (flax_model, params)."""
    canonical = _ALIASES.get(name, name)
    if canonical not in _IMPORTERS:
        raise ValueError(
            f"no torch->flax importer for {name!r}; supported: "
            f"{supported_torch_models()}")
    converter, keep = _IMPORTERS[canonical]
    kw = dict(kwargs)
    kw["__name"] = canonical
    params = converter(sd, kw)
    create_kw = _model_kwargs(kwargs, keep)
    create_kw.update(_EXTRA_KWARGS.get(canonical, {}))
    model = create_model(name, **create_kw)
    return model, params


def load_torch_model(path: str, cache: bool = True):
    """Load a reference .pth checkpoint as (model, params, meta).

    When ``cache`` is set, writes ``<path>.nztm`` on first load and reads
    it back on later loads (reference equivalence:
    iw3/base_depth_model.py:101-125 caches hub downloads similarly).
    """
    from .io import load_model as load_nztm, save_model

    cache_path = path + ".nztm"
    if cache and os.path.exists(cache_path) and (
            os.path.getmtime(cache_path) >= os.path.getmtime(path)):
        return load_nztm(cache_path)

    name, kwargs, sd = load_torch_checkpoint(path)
    if name is None:
        raise ValueError(
            f"{path}: raw state_dict without a nunif envelope — use "
            "nunif_tpu.models.torch_convert converters directly")
    model, params = convert_torch_state(name, kwargs, sd)
    meta = {"name": name, "kwargs": kwargs, "imported_from": path}
    if cache:
        try:
            save_model(model, params, cache_path, train_kwargs=None)
            logger.debug("cached converted checkpoint at %s", cache_path)
        except OSError:
            pass
    return model, params, meta

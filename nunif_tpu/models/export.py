"""Model export as serialized StableHLO programs.

TPU-native re-design of the reference's ONNX export pipeline
(reference: waifu2x/export_onnx.py + nunif/models/onnx_helper_models.py):
instead of ONNX graphs for onnxruntime-web, models are exported with
``jax.export`` — a portable, versioned StableHLO artifact that any XLA
runtime (TPU/GPU/CPU, IREE, PJRT plugins) can load and execute without
Python model code.

The exported program is the full frame pipeline at a static (tile,
batch) bucket — the same contract the reference's ONNX models have
(fixed tile, dynamic spatial dims replaced by bucketed shapes, which is
the TPU-idiomatic equivalent).

Artifact layout (.nzhlo file = zip):
  program.bin   serialized jax.export artifact
  meta.json     {name, kwargs, input_shapes, dtypes, nunif_tpu: 1}
  params.npz    parameters (flattened), unless baked into the program
"""
from __future__ import annotations

import io
import json
import zipfile

import numpy as np
import jax
import jax.numpy as jnp

from ..core.logger import logger
from .model import model_kwargs


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    root = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return root


def export_model(model, params, path, input_shape, bake_params=False,
                 extra_meta=None, apply_kwargs=None):
    """Serialize ``model.apply_fn`` at a static input bucket.

    input_shape: full NHWC shape, e.g. (batch, tile, tile, 3).
    bake_params: close over the params (single-file artifact, larger
    program); otherwise params ship separately in the zip and are passed
    at call time (allows weight updates without re-export).
    """
    from jax import export as jexport
    apply_kwargs = apply_kwargs or {}

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    if bake_params:
        def fn(x):
            return model.apply_fn(params, x, **apply_kwargs)
        exported = jexport.export(jax.jit(fn))(x_spec)
    else:
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
            params)

        def fn(p, x):
            return model.apply_fn(p, x, **apply_kwargs)
        exported = jexport.export(jax.jit(fn))(p_spec, x_spec)

    meta = {
        "nunif_tpu_export": 1,
        "name": model.model_name,
        "kwargs": model_kwargs(model),
        "input_shape": list(input_shape),
        "baked": bool(bake_params),
    }
    meta.update(extra_meta or {})
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("program.bin", exported.serialize())
        z.writestr("meta.json", json.dumps(meta))
        if not bake_params:
            buf = io.BytesIO()
            np.savez(buf, **_flatten(params))
            z.writestr("params.npz", buf.getvalue())
    logger.info("exported %s -> %s (input %s)", model.model_name, path,
                tuple(input_shape))
    return path


class ExportedModel:
    """Load and call a .nzhlo artifact without the model's Python code."""

    def __init__(self, path):
        from jax import export as jexport
        with zipfile.ZipFile(path, "r") as z:
            self.meta = json.loads(z.read("meta.json"))
            self.exported = jexport.deserialize(
                bytearray(z.read("program.bin")))
            self.params = None
            if not self.meta["baked"]:
                flat = np.load(io.BytesIO(z.read("params.npz")))
                self.params = _unflatten({k: flat[k] for k in flat.files})

    @property
    def input_shape(self):
        return tuple(self.meta["input_shape"])

    def __call__(self, x):
        if self.meta["baked"]:
            return self.exported.call(x)
        return self.exported.call(self.params, x)


def _export_fn(fn, specs, path, name, extra_meta=None):
    """Serialize a plain jittable function as a .nzhlo artifact."""
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*specs)
    meta = {"nunif_tpu_export": 1, "name": name,
            "input_shape": [list(s.shape) for s in specs], "baked": True}
    meta.update(extra_meta or {})
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("program.bin", exported.serialize())
        z.writestr("meta.json", json.dumps(meta))
    logger.info("exported helper op %s -> %s", name, path)
    return path


def export_helper_ops(out_dir, tile_size=256, channels=3, scale=2,
                      offset=16, blend_size=8, pad=16):
    """Export the inference helper-op set as StableHLO programs.

    TPU-native equivalent of the reference's standalone ONNX helper models
    (reference nunif/models/onnx_helper_models.py:14-305): reflection /
    alpha-border padding, 8-way TTA split/merge, seam-blend filter
    generation, antialias and bicubic 2x resize — each a portable
    program any XLA runtime can execute (the browser-runtime role of the
    reference's ONNX files).
    """
    import os
    from ..transforms.tta import tta_split, tta_merge
    from ..utils.tiling import make_blend_filter
    from ..utils.alpha import alpha_border_pad
    from ..modules.resize import resize

    os.makedirs(out_dir, exist_ok=True)
    t = int(tile_size)
    img = jax.ShapeDtypeStruct((1, t, t, channels), jnp.float32)
    a1 = jax.ShapeDtypeStruct((1, t, t, 1), jnp.float32)
    paths = {}

    paths["pad"] = _export_fn(
        lambda x: jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                          mode="reflect"),
        [img], os.path.join(out_dir, "pad.nzhlo"),
        "helper.reflection_pad", {"pad": pad})
    paths["alpha_border_pad"] = _export_fn(
        lambda rgb, alpha: alpha_border_pad(rgb[0], alpha[0], offset)[None],
        [img, a1], os.path.join(out_dir, "alpha_border_pad.nzhlo"),
        "helper.alpha_border_padding", {"offset": offset})
    paths["tta_split"] = _export_fn(
        lambda x: jnp.stack(tta_split(x[0]))[:, None],
        [img], os.path.join(out_dir, "tta_split.nzhlo"), "helper.tta_split")
    tta_in = jax.ShapeDtypeStruct((8, 1, t, t, channels), jnp.float32)
    paths["tta_merge"] = _export_fn(
        lambda xs: tta_merge(tuple(xs[i, 0] for i in range(8)))[None],
        [tta_in], os.path.join(out_dir, "tta_merge.nzhlo"),
        "helper.tta_merge")
    blend = make_blend_filter(scale, offset, t, blend_size)
    paths["seam_blend_filter"] = _export_fn(
        lambda dummy: jnp.asarray(blend)[None, ..., None] * jnp.ones_like(dummy[:, :1, :1, :1]),
        [jax.ShapeDtypeStruct((1, 1, 1, 1), jnp.float32)],
        os.path.join(out_dir, "seam_blend_filter.nzhlo"),
        "helper.create_seam_blending_filter",
        {"scale": scale, "offset": offset, "blend_size": blend_size})
    paths["antialias"] = _export_fn(
        lambda x: resize(resize(x, t * 2, t * 2, mode="bicubic",
                                antialias=True), t, t, mode="bicubic",
                         antialias=True),
        [img], os.path.join(out_dir, "antialias.nzhlo"), "helper.antialias")
    paths["bicubic_2x"] = _export_fn(
        lambda x: resize(x, t * 2, t * 2, mode="bicubic", antialias=False),
        [img], os.path.join(out_dir, "bicubic_2x.nzhlo"),
        "helper.resize_bicubic", {"scale": 2})
    return paths

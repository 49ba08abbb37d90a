"""Self-describing checkpoint I/O.

TPU-native replacement for the reference's .pth envelope
(reference: nunif/models/utils.py:15-74, envelope at :31-39).

Format: a single ``.npz`` file whose entries are the flattened param leaves
(path components joined by '/'), plus a ``__meta__`` entry holding JSON:
    {"nunif_tpu_model": 1, "name": ..., "kwargs": ..., "train_kwargs": ...,
     "updated_at": ...}
``load_model`` reconstructs the architecture from the file alone via the
registry, exactly like the reference's load_model(:56-58).

Also: ``merge_state_dict`` / ``mean_state_dict`` weight averaging
(reference: nunif/models/utils.py:135-159).
"""
from __future__ import annotations

import datetime
import io
import json
import os
import zipfile
from typing import Optional, Tuple

import jax
import numpy as np

from ..core.logger import logger
from .model import Model, model_kwargs
from .register import create_model

FORMAT_KEY = "nunif_tpu_model"
FORMAT_VERSION = 1
META_ENTRY = "__meta__.json"


def flatten_params(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_model(model: Model, params, model_path: str,
               train_kwargs: Optional[dict] = None, **extra_meta):
    meta = {
        FORMAT_KEY: FORMAT_VERSION,
        "name": model.model_name,
        "kwargs": _jsonable(model_kwargs(model)),
        "train_kwargs": _jsonable(train_kwargs) if train_kwargs else None,
        "updated_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }
    meta.update(_jsonable(extra_meta))
    flat = flatten_params(params)
    directory = os.path.dirname(model_path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    tmp_path = model_path + ".tmp"
    with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(META_ENTRY, json.dumps(meta))
        for key, arr in flat.items():
            buf = io.BytesIO()
            np.save(buf, arr, allow_pickle=False)
            zf.writestr(key + ".npy", buf.getvalue())
    os.replace(tmp_path, model_path)
    logger.debug("saved model %s -> %s", model.model_name, model_path)


_APP_PACKAGES = {
    "waifu2x": "nunif_tpu.waifu2x",
    "sbs": "nunif_tpu.iw3.models",
    "iw3": "nunif_tpu.iw3",
    "cliqa": "nunif_tpu.cliqa",
    "imagenet": "nunif_tpu.imagenet",
    "stlizer": "nunif_tpu.stlizer",
    "dino": "nunif_tpu.dino",
}


def _ensure_registered(name: str):
    """Import the app package owning ``name`` so its models register —
    the checkpoint is self-describing regardless of caller imports
    (reference load_model does this via eager global registration)."""
    import importlib
    prefix = name.split(".", 1)[0]
    pkg = _APP_PACKAGES.get(prefix)
    if pkg:
        try:
            importlib.import_module(pkg)
        except ImportError:
            pass


def load_model(model_path: str, device=None) -> Tuple[Model, dict, dict]:
    """Load (model, params, meta) reconstructing the architecture by name.

    Reference ``.pth`` checkpoints are accepted directly: they are
    converted via torch_convert and cached as ``<path>.nztm``
    (models/pth_import.py)."""
    if model_path.endswith(".pth"):
        from .pth_import import load_torch_model
        model, params, meta = load_torch_model(model_path)
        if device is not None:
            params = jax.device_put(params, device)
        return model, params, meta
    with zipfile.ZipFile(model_path, "r") as zf:
        meta = json.loads(zf.read(META_ENTRY))
        if meta.get(FORMAT_KEY) != FORMAT_VERSION:
            raise ValueError(f"{model_path}: not a nunif_tpu model checkpoint")
        flat = {}
        for info in zf.infolist():
            if info.filename == META_ENTRY:
                continue
            key = info.filename[:-len(".npy")]
            flat[key] = np.load(io.BytesIO(zf.read(info)), allow_pickle=False)
    _ensure_registered(meta["name"])
    model = create_model(meta["name"], **(meta.get("kwargs") or {}))
    params = unflatten_params(flat)
    params = jax.device_put(params, device) if device is not None else params
    logger.debug("loaded model %s from %s", meta["name"], model_path)
    return model, params, meta


def merge_state_dict(a, b, alpha: float = 0.5):
    """alpha*a + (1-alpha)*b elementwise over matching pytrees."""
    return jax.tree_util.tree_map(
        lambda x, y: np.asarray(x) * alpha + np.asarray(y) * (1.0 - alpha), a, b)


def mean_state_dict(params_list):
    n = len(params_list)
    acc = params_list[0]
    for p in params_list[1:]:
        acc = jax.tree_util.tree_map(lambda x, y: x + np.asarray(y, np.float64), acc, p)
    return jax.tree_util.tree_map(
        lambda x, ref: (np.asarray(x, np.float64) / n).astype(np.asarray(ref).dtype),
        acc, params_list[0])


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)

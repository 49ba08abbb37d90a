"""Addon system — app plugins registering train / data-generation commands.

Behavioral parity target: reference nunif/addon.py:6-53 (Addon base with
register_train / register_create_training_data hooks, discovered from
nunif_addon.py files).  Here the addon list is an explicit registry of
module paths (no filesystem scanning — the apps live in this package).
"""
from __future__ import annotations

import importlib

from .core.logger import logger

ADDON_MODULES = [
    "nunif_tpu.waifu2x.training.trainer",
    "nunif_tpu.iw3.training.sbs.trainer",
    "nunif_tpu.iw3.training.inpaint.trainer",
    "nunif_tpu.iw3.training.sod",
    "nunif_tpu.iw3.training.depth_aa",
    "nunif_tpu.iw3.training.da3mono",
    "nunif_tpu.stlizer.training",
    "nunif_tpu.cliqa.training",
    "nunif_tpu.imagenet.training",
]


def load_addons(kind: str):
    """kind: "train" | "create_training_data".  Returns list of
    (module, register_fn)."""
    fn_name = {"train": "register_train",
               "create_training_data": "register_create_training_data"}[kind]
    out = []
    for mod_path in ADDON_MODULES:
        try:
            mod = importlib.import_module(mod_path)
        except ImportError as e:
            logger.debug("addon %s not available: %s", mod_path, e)
            continue
        fn = getattr(mod, fn_name, None)
        if fn is not None:
            out.append((mod, fn))
    return out

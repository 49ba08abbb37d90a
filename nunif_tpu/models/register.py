"""Model registry (reference: nunif/models/register.py:10-67).

Name -> class/factory mapping so checkpoints can reconstruct their own
architecture.  Aliases supported.  There is no device placement here —
params live wherever the caller shards them.
"""
from __future__ import annotations

from typing import Callable, Dict, Union

from .model import Model

_models: Dict[str, Callable[..., Model]] = {}


def register_model(cls):
    """Class decorator: register under ``cls.model_name``."""
    name = getattr(cls, "model_name", None)
    if not name:
        raise ValueError(f"{cls} has no `model_name` class attribute")
    _models[name] = cls
    return cls


def register_model_factory(name: str, factory: Callable[..., Model]):
    _models[name] = factory


def register_model_alias(alias: str, name: str):
    if name not in _models:
        raise KeyError(name)
    _models[alias] = _models[name]


def create_model(name: str, **kwargs) -> Model:
    if name not in _models:
        raise ValueError(f"unknown model: {name!r} (known: {sorted(_models)})")
    return _models[name](**kwargs)


def get_model_names():
    return sorted(_models.keys())


def resolve_alias(name: str) -> str:
    """Canonical model_name for an alias (reference
    nunif/cli/convert_model_alias.py semantics)."""
    entry = _models.get(name)
    if entry is None:
        return name
    canonical = getattr(entry, "model_name", None)
    return canonical or name


def get_model_class(name: str):
    return _models[name]

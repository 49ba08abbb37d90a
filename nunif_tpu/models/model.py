"""Model base classes.

TPU-native re-design of the reference's model contract
(reference: nunif/models/model.py:7-123).

Differences from the reference, by design:
  * Models are flax.linen Modules — pure functions of (params, inputs). The
    hyperparameters ARE the dataclass fields, so kwargs capture (the
    reference's ``register_kwargs``) is automatic: ``model_kwargs(m)``
    reads the dataclass fields back for self-describing checkpoints.
  * Layout is NHWC (TPU conv layout), not NCHW.
  * The I2I tile contract exposes *static* valid tile sizes so XLA compiles
    one program per (tile, batch) bucket instead of the reference's dynamic
    tile validator loop (nunif/models/model.py:44-62).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..core.logger import logger

# bump to invalidate all cached init trees on format change
_INIT_CACHE_SCHEMA = 2


def _flatten_paths(params):
    """Flatten a nested-dict param tree to (path strings, leaves).

    Safe serialization for the init cache: paths are "a/b/c" strings
    (flax module names never contain "/"), no pickled treedef — a
    poisoned cache file can at worst yield wrong arrays, never code
    execution.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths, leaves = [], []
    for path, leaf in flat:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        assert all("/" not in str(k) for k in keys), keys
        paths.append("/".join(str(k) for k in keys))
        leaves.append(leaf)
    return paths, leaves


def _unflatten_paths(paths, leaves):
    params = {}
    for pth, leaf in zip(paths, leaves):
        d = params
        parts = pth.split("/")
        for part in parts[:-1]:
            d = d.setdefault(part, {})
        d[parts[-1]] = leaf
    return params


class Model(nn.Module):
    """Base class for all registered models.

    Subclasses must set a class attribute ``name`` ("app.arch") and define
    ``__call__(self, x, *, train=False)``.
    """
    # subclass class-attr: name: str

    def init_params(self, key: jax.Array, input_shape) -> dict:
        """Initialize parameters from an example input shape (NHWC).

        On an accelerator backend, init runs pinned to the CPU backend
        (pure RNG math; compiling the init program through a remote TPU
        compile service measured 270 s for a ViT-S) and the RESULT is
        cached on disk keyed by (model, kwargs, shape, key): even the
        CPU compile of a large init program is minutes and XLA:CPU cache
        entries don't transport across heterogenous compile hosts.  The
        cache makes repeat loads ~1 s.  NUNIF_TPU_INIT_CACHE overrides
        the directory; set to "0" to disable.
        """
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is None or jax.default_backend() == "cpu":
            x = jnp.zeros(input_shape, jnp.float32)
            return self.init(key, x, train=False)["params"]

        cache_path = None
        cache_dir = os.environ.get("NUNIF_TPU_INIT_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "nunif_tpu", "init")
        if cache_dir != "0":
            import hashlib
            try:
                kd = np.asarray(jax.random.key_data(key))
            except (TypeError, ValueError):
                kd = np.asarray(key)
            # fold the model's LOADED code into the key so editing a model
            # definition invalidates its cached init tree.  NOT
            # inspect.getsource: that reads the file at call time, so a
            # long-running process whose in-memory class predates an
            # on-disk edit would key its (old) params under the NEW hash,
            # poisoning the cache for later processes (observed live).
            import types

            h = hashlib.sha1()

            def _add_code(co):
                h.update(co.co_code)
                for c in co.co_consts:
                    if isinstance(c, types.CodeType):
                        _add_code(c)
                    else:
                        h.update(repr(c).encode())

            for klass in type(self).__mro__:
                for name in sorted(vars(klass)):
                    fn = vars(klass)[name]
                    fn = getattr(fn, "__func__", fn)
                    if isinstance(fn, types.FunctionType):
                        h.update(name.encode())
                        _add_code(fn.__code__)
            ident = repr((_INIT_CACHE_SCHEMA, type(self).__name__,
                          h.hexdigest(), sorted(
                model_kwargs(self).items()), tuple(input_shape),
                kd.tolist()))
            digest = hashlib.sha1(ident.encode()).hexdigest()
            cache_path = os.path.join(cache_dir, digest + ".npz")
            try:
                # return UNCOMMITTED numpy leaves: the first jit call
                # transfers the whole tree in one batched h2d instead of
                # ~300 per-leaf device_put round trips (latency-bound
                # through this harness's tunnel), and uncommitted inputs
                # keep jit compiling for the default (accelerator) backend
                with np.load(cache_path) as z:
                    paths = json.loads(str(z["paths"]))
                    flat = [z[f"p{i}"] for i in range(len(paths))]
                params = _unflatten_paths(paths, flat)
                logger.debug("init_params: disk cache hit %s", cache_path)
                return params
            except (OSError, KeyError, ValueError):
                logger.debug("init_params: disk cache miss %s", cache_path)

        # one jitted CPU program (inputs CPU-committed so placement
        # follows), then move the tree to the accelerator so later
        # jits compile for it
        key = jax.device_put(key, cpu)
        with jax.default_device(cpu):
            x = jnp.zeros(input_shape, jnp.float32)
            params = jax.jit(
                lambda k, xx: self.init(k, xx, train=False))(
                key, x)["params"]

        # host copies: uncommitted, one batched transfer at first use
        params = jax.tree_util.tree_map(lambda v: np.asarray(v), params)
        if cache_path is not None:
            try:
                os.makedirs(cache_dir, mode=0o700, exist_ok=True)
                paths, flat = _flatten_paths(params)
                np.savez(cache_path + ".tmp.npz", n=len(flat),
                         paths=json.dumps(paths),
                         **{f"p{i}": v for i, v in enumerate(flat)})
                os.replace(cache_path + ".tmp.npz", cache_path)
                logger.debug("init_params: wrote disk cache %s", cache_path)
            except Exception:  # noqa: BLE001 — cache is best-effort
                logger.exception("init_params: disk cache write failed")
        return params

    def apply_fn(self, params, x, train: bool = False, rngs=None, **kwargs):
        return self.apply({"params": params}, x, train=train, rngs=rngs, **kwargs)


def model_kwargs(model: Model) -> dict:
    """Extract constructor kwargs (dataclass fields) for checkpointing."""
    out = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        if callable(v) and not isinstance(v, (int, float, str, bool, tuple, list)):
            continue  # non-serializable factory fields are reconstructed by the class default
        out[f.name] = v
    return out


class I2IBaseModel(Model):
    """Image-to-image model contract (reference: nunif/models/model.py:65-115).

    Class attrs (overridable per subclass):
      i2i_scale: output scale factor
      i2i_offset: pixels cropped from each output border relative to
                  input*scale (valid-conv shrinkage), in output pixels
      i2i_blend_size: seam-blend border width in output pixels
      i2i_tile_quantum: valid tile sizes are those where
                        ``tile % q.modulo == q.residue`` for every (modulo,
                        residue) pair — the static replacement for the
                        reference's per-arch tile validators.
    """
    # deliberately NOT dataclass fields (no annotations): plain class attrs so
    # subclasses override them without flax's dataclass transform interfering
    i2i_scale = 1
    i2i_offset = 0
    i2i_blend_size = 0
    i2i_default_tile_size = 256
    i2i_default_batch_size = 4
    # list of (modulo, residue) constraints on the INPUT tile size
    i2i_tile_constraints = ()

    @property
    def i2i_in_channels(self) -> int:
        return getattr(self, "in_channels", 3)

    def is_valid_tile_size(self, size: int) -> bool:
        if size <= self.i2i_offset * 2 // max(self.i2i_scale, 1):
            return False
        return all(size % m == r for (m, r) in self.i2i_tile_constraints)

    def find_valid_tile_size(self, tile_size: Optional[int]) -> int:
        """Round the requested tile size up to the nearest valid one."""
        if tile_size is None:
            tile_size = self.i2i_default_tile_size
        t = int(tile_size)
        for _ in range(4096):
            if self.is_valid_tile_size(t):
                return t
            t += 1
        raise ValueError(f"no valid tile size >= {tile_size} for {type(self)}")


class SoftmaxBaseModel(Model):
    """Classification model contract (reference: nunif/models/model.py:118)."""
    # subclasses define: num_classes field
    pass

"""Device mesh + sharding helpers — the first-class comm backend.

TPU-native replacement for the reference's single-process multi-GPU
DataParallel (reference: nunif/models/data_parallel.py:8-68 and SURVEY.md
§2.6): instead of replicate/scatter/gather per call, we build a
``jax.sharding.Mesh`` over ICI (one process) or ICI+DCN (multi-host via
``jax.distributed.initialize``) and annotate shardings; XLA inserts the
collectives.

Axis conventions:
  "dp"  data parallel (batch axis)      — default for all training/inference
  "tp"  tensor parallel (channel axis)  — available for wide attention models
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """Build a mesh. Default: 1-D "dp" mesh over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host (DCN) initialization — the NCCL-backend equivalent.

    No-op when running single-process.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch (pytree of arrays) sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_params(mesh: Mesh, params):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), params)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


# --------------------------------------------------------------------------
# tensor-parallel param partitioning (Megatron pattern over the "tp" axis)

def partition_params(mesh: Mesh, params, rules, default: P = P()):
    """Place a flax param tree on ``mesh`` with per-path PartitionSpecs.

    ``rules``: ordered list of (substring_or_regex, PartitionSpec); the first
    rule whose pattern matches the "/"-joined param path wins.  Params with
    no matching rule use ``default`` (replicated).

    Column/row parallel convention (the standard two-matmul TP schedule):
      qkv / fc1 kernels -> P(None, "tp")   (shard output features)
      proj / fc2 kernels -> P("tp", None)  (shard input features; XLA
                                            inserts the psum)
    """
    import re
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    placed = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        spec = default
        for pat, s in rules:
            if re.search(pat, name):
                spec = s
                break
        if hasattr(leaf, "ndim") and any(a is not None for a in spec):
            # drop specs that don't fit this leaf's rank or don't divide
            if len(spec) > leaf.ndim:
                spec = default
            else:
                axis_ok = True
                for d, a in enumerate(spec):
                    if a is None:
                        continue
                    size = mesh.shape[a] if isinstance(a, str) else 1
                    if leaf.shape[d] % size != 0:
                        axis_ok = False
                if not axis_ok:
                    spec = default
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


MEGATRON_TP_RULES = [
    (r"(qkv|fc1|mlp.*0|dense_in)/kernel", P(None, "tp")),
    (r"(qkv|fc1|mlp.*0|dense_in)/bias", P("tp")),
    (r"(proj|fc2|mlp.*3|dense_out)/kernel", P("tp", None)),
]

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

"""Thin collective wrappers over ICI/DCN (SURVEY.md §2.6 / §5.8).

These are the named-axis primitives used inside ``shard_map``-style code and
by any future sequence/context-parallel extension (ring ``ppermute`` halo
exchange for Video-Depth-Anything temporal windows, SURVEY.md §5.7).
Outside shard_map, prefer sharding annotations and let XLA insert these.
"""
import jax
from jax import lax


def psum(x, axis: str = "dp"):
    return lax.psum(x, axis_name=axis)


def pmean(x, axis: str = "dp"):
    return lax.pmean(x, axis_name=axis)


def all_gather(x, axis: str = "dp", *, tiled: bool = True):
    return lax.all_gather(x, axis_name=axis, tiled=tiled)


def ppermute_ring(x, axis: str = "dp", shift: int = 1):
    """Ring shift: device i sends to (i+shift) mod n."""
    n = lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis_name=axis, perm=perm)


def reduce_scatter(x, axis: str = "dp", *, scatter_dimension: int = 0):
    return lax.psum_scatter(x, axis_name=axis,
                            scatter_dimension=scatter_dimension, tiled=True)


def axis_index(axis: str = "dp"):
    return lax.axis_index(axis)

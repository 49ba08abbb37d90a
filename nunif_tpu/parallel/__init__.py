from .mesh import (
    make_mesh, init_distributed, batch_sharding, replicated,
    shard_batch, replicate_params, pad_to_multiple,
    partition_params, MEGATRON_TP_RULES,
)
from . import collectives

__all__ = [
    "make_mesh", "init_distributed", "batch_sharding", "replicated",
    "shard_batch", "replicate_params", "pad_to_multiple",
    "partition_params", "MEGATRON_TP_RULES", "collectives",
]

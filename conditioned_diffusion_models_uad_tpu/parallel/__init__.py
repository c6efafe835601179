"""Device-mesh parallelism utilities.

The reference's only multi-device strategy is PyTorch-DDP data parallelism over
NCCL (reference src/train.py:62-65, SURVEY.md §2.7). The TPU-native equivalent
is a 1-D `jax.sharding.Mesh` over ICI with batch-sharded inputs and replicated
parameters — XLA inserts the gradient all-reduce. These helpers centralize mesh
construction and the sharding annotations used by the trainer and the
slice-parallel eval path.
"""
from .mesh import (
    DATA_AXIS,
    batch_sharding,
    local_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "local_mesh",
    "pad_to_multiple",
    "replicated_sharding",
    "shard_batch",
]

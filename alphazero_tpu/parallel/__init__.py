"""Mesh/sharding + multi-host (new capability vs single-device reference)."""

from alphazero_tpu.parallel.mesh import (
    make_mesh, replicated, data_sharded, batch_pytree_sharding,
    vit_param_sharding, replicated_param_sharding,
)
from alphazero_tpu.parallel.spmd import (
    buffer_ready, make_collect_chunk, make_super_step, make_train_chunk,
    shardings_for, jit_super_step,
)
from alphazero_tpu.parallel.distributed import initialize, process_info

__all__ = [
    "make_mesh", "replicated", "data_sharded", "batch_pytree_sharding",
    "vit_param_sharding", "replicated_param_sharding",
    "make_super_step", "make_collect_chunk", "make_train_chunk",
    "buffer_ready", "shardings_for", "jit_super_step",
    "initialize", "process_info",
]

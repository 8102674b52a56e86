"""Mesh/sharding + multi-host (new capability vs single-device reference)."""

from alphazero_tpu.parallel.mesh import (
    make_mesh, replicated, data_sharded, batch_pytree_sharding,
    vit_param_sharding, replicated_param_sharding,
)
from alphazero_tpu.parallel.spmd import (
    make_super_step, shardings_for, jit_super_step,
)
from alphazero_tpu.parallel.distributed import initialize, process_info

__all__ = [
    "make_mesh", "replicated", "data_sharded", "batch_pytree_sharding",
    "vit_param_sharding", "replicated_param_sharding",
    "make_super_step", "shardings_for", "jit_super_step",
    "initialize", "process_info",
]

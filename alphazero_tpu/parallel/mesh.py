"""Device mesh and sharding rules.

The reference is single-process/single-device (SURVEY.md §2.3: no DDP, no
collectives anywhere); scaling here is the TPU-native axis the reference
lacks: a ``('data', 'model')`` mesh where the self-play game batch and the
learner batch shard over ``data`` (gradient all-reduce inserted by XLA over
ICI) and wide networks tensor-parallel over ``model`` (Megatron-style head/
MLP sharding for the ViT)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = mesh_utils.create_device_mesh((n_data, n_model),
                                         devices=devices[: n_data * n_model])
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def batch_pytree_sharding(tree, mesh: Mesh, batch_size: int):
    """Sharding tree: leaves whose leading dim equals ``batch_size`` shard
    on dim 0 over 'data'; everything else (counters, rng, rows of other
    sizes) replicates."""
    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == batch_size:
            return NamedSharding(mesh, P("data"))
        return replicated(mesh)
    return jax.tree.map(spec, tree)


def vit_param_sharding(params, mesh: Mesh):
    """Megatron-style tensor-parallel specs for the ViT over 'model':
    attention heads and the MLP hidden dimension are split; everything else
    replicates.  XLA inserts the all-reduces on the block outputs."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}

    def put(path, spec):
        out[tuple(p.key for p in path)] = NamedSharding(mesh, spec)

    for path, leaf in flat:
        keys = [p.key for p in path]
        joined = "/".join(str(k) for k in keys)
        if "attn" in joined and keys[-1] == "kernel":
            if "out" in joined:
                put(path, P("model", None, None))   # (H, hd, E)
            else:
                put(path, P(None, "model", None))   # (E, H, hd) q/k/v
        elif "attn" in joined and keys[-1] == "bias" and "out" not in joined:
            put(path, P("model", None))             # (H, hd)
        elif "mlp_fc1" in joined and keys[-1] == "kernel":
            put(path, P(None, "model"))             # (E, 4E)
        elif "mlp_fc1" in joined and keys[-1] == "bias":
            put(path, P("model"))
        elif "mlp_fc2" in joined and keys[-1] == "kernel":
            put(path, P("model", None))             # (4E, E)
        else:
            put(path, P())

    # rebuild as a pytree matching params
    def lookup(path, leaf):
        return out[tuple(p.key for p in path)]
    return jax.tree_util.tree_map_with_path(lookup, params)


def replicated_param_sharding(params, mesh: Mesh):
    return jax.tree.map(lambda _: replicated(mesh), params)


def place(tree, shardings):
    """Device-put a pytree according to a sharding pytree."""
    return jax.tree.map(jax.device_put, tree, shardings)

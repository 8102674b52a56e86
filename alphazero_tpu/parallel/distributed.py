"""Multi-host runtime setup.

The reference has no distributed layer at all (SURVEY.md §2.3).  On a TPU
pod slice each host runs this same program; ``jax.distributed.initialize``
wires the hosts into one JAX runtime and ``make_mesh`` then spans the global
device set — collectives ride ICI within a slice and DCN across slices with
no hand-written transport."""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when running under a launcher.

    No-ops (returns False) in single-process runs: TPU pod launchers set the
    cluster env (or the caller passes explicit arguments)."""
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }

"""Persistent XLA compilation cache.

First compiles of the jitted self-play/training programs take minutes
(remote TPU compile service); the persistent cache makes every later
process start near-instantly.  Called by bench.py, the CLI, and the driver
entry points before any jit."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.expanduser("~/.cache/alphazero_tpu/jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

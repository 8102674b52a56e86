"""Test configuration: run everything on an 8-virtual-device CPU mesh.

The container boots JAX with a remote-TPU ("axon") backend whose register()
call force-selects the axon platform via ``jax.config`` — an env-var
``JAX_PLATFORMS=cpu`` is therefore NOT enough.  We must (a) extend XLA_FLAGS
before the CPU client is created and (b) override the platform through
``jax.config`` after import (SURVEY.md §4-4: distributed tests on simulated
host devices).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

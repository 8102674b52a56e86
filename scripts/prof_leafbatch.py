"""Time run_mcts across leaf_batch values on the real chip.

Round-4 verdict (docs/DESIGN.md "Leaf batching: measured and rejected"):
K>1 lost end-to-end on every eval-bound config, the Pallas round kernel
was deleted, and no preset enables leaf_batch.  This harness remains for
re-probing the XLA engine's K rounds on future configs/model sizes.

Usage: python -m scripts.prof_leafbatch [resnet|gomoku9] ...
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts


def probe(preset_name, B, ks, backend, n=3, sims=None):
    cfg = preset(preset_name)
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    ev = make_eval_fn(model, params)
    boards = jnp.zeros((B, 2, env.rows, env.cols), jnp.int8)
    players = jnp.zeros((B,), jnp.int32)
    mc = jnp.zeros((B,), jnp.int32)
    dones = jnp.zeros((B,), jnp.bool_)

    for k in ks:
        mcfg = dataclasses.replace(cfg.mcts, leaf_batch=k)
        if sims:
            mcfg = dataclasses.replace(mcfg, num_simulations=sims)

        @jax.jit
        def f(rng, mcfg=mcfg):
            r = run_mcts(env, ev, boards, players, mc, dones, rng, mcfg,
                         backend=backend)
            return r.visit_counts

        t0 = time.perf_counter()
        o = f(jax.random.PRNGKey(0))
        float(o.sum())
        print(f"[{preset_name} K={k}] compile {time.perf_counter()-t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(n):
            o = f(jax.random.PRNGKey(i))
        float(o.sum())
        dt = (time.perf_counter() - t0) / n
        print(f"[{preset_name} {backend} K={k}] {dt*1e3:.1f} ms/move-search "
              f"-> {B/dt:,.0f} env-steps/s bound", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["resnet"]
    if "resnet" in which:
        probe("connect4-resnet", 512, [1, 4, 8], "xla")
    if "gomoku9" in which:
        probe("gomoku9", 256, [1, 8], "xla", n=2)

"""Time run_mcts across leaf_batch values on the real chip.

VERDICT r1 #9: leaf-batched rounds (K virtual-loss descents sharing one
K·B-position forward) were measured 2.6x cheaper per eval for the conv
nets — decide whether any preset should enable them.  Probes the XLA
engine for the eval-bound configs (connect4-resnet, gomoku9) and the
Pallas rounds path for the dense flagship.

Usage: python -m scripts.prof_leafbatch [dense|resnet|gomoku9] ...
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
    if "dense" in which:
        probe("connect4", 512, [1, 4, 8], "pallas")
    if "resnet" in which:
        probe("connect4-resnet", 512, [1, 4, 8], "xla")
    if "gomoku9" in which:
        probe("gomoku9", 256, [1, 8], "xla", n=2)

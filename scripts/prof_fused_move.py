"""Whole-move fused kernel timing on the real chip (bench config)."""
import dataclasses
import time
import jax, jax.numpy as jnp, numpy as np

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset, ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts
from alphazero_tpu.search.pallas_fused import supports_fused

cfg = preset("connect4")
env = make_env(cfg.env)
B = 512
boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mc = jnp.zeros((B,), jnp.int32)
dones = jnp.zeros((B,), jnp.bool_)

for mcfg in [ModelConfig(family="dense", width=512, blocks=3),
             ModelConfig(family="dense", width=768, blocks=4)]:
    model = build_model(mcfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    ev = make_eval_fn(model, params)
    print(f"supports_fused w={mcfg.width} b={mcfg.blocks}:",
          supports_fused(env, B, cfg.mcts, model))

    for backend in ("fused", "pallas"):
        @jax.jit
        def f(rng, ev=ev, backend=backend):
            return run_mcts(env, ev, boards, players, mc, dones, rng,
                            cfg.mcts, backend=backend).visit_counts

        t0 = time.perf_counter()
        o = f(jax.random.PRNGKey(0)); jax.block_until_ready(o)
        print(f"  [{backend}] compile+first: {time.perf_counter()-t0:.1f}s "
              f"sums={np.unique(np.asarray(o).sum(-1))}")
        t0 = time.perf_counter()
        n = 5
        for i in range(n):
            o = f(jax.random.PRNGKey(i))
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"  [{backend}] w={mcfg.width}: {dt*1e3:.1f} ms/search -> "
              f"{B/dt:,.0f} env-steps/s bound")

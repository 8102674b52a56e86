"""Time run_mcts on the real chip across leaf_batch values (bench config)."""
import time
import jax, jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset, MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts
import dataclasses

cfg = preset("connect4")
env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
ev = make_eval_fn(model, params)

B = 512
boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mc = jnp.zeros((B,), jnp.int32)
dones = jnp.zeros((B,), jnp.bool_)

for backend, k in [("pallas", 1), ("pallas", 2), ("pallas", 4),
                   ("pallas", 8), ("pallas", 16)]:
    mcfg = dataclasses.replace(cfg.mcts, leaf_batch=k)

    @jax.jit
    def f(rng, mcfg=mcfg, backend=backend):
        r = run_mcts(env, ev, boards, players, mc, dones, rng, mcfg,
                     backend=backend)
        return r.visit_counts

    o = f(jax.random.PRNGKey(0)); jax.block_until_ready(o)
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        o = f(jax.random.PRNGKey(i))
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    eff = B / dt  # env-steps/s if every move cost this one search
    print(f"{backend} K={k}: {dt*1e3:.1f} ms/move-search -> {eff:,.0f} "
          f"env-steps/s upper bound")

"""Full-search timing with the dense tower vs the conv ResNet (bench cfg)."""
import dataclasses
import time
import jax, jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset, ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts

cfg = preset("connect4")
env = make_env(cfg.env)
B = 512
boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mc = jnp.zeros((B,), jnp.int32)
dones = jnp.zeros((B,), jnp.bool_)

for mcfg, k in [
    (ModelConfig(family="resnet", channels=64, blocks=4), 1),
    (ModelConfig(family="dense", width=512, blocks=3), 1),
    (ModelConfig(family="dense", width=512, blocks=3), 4),
    (ModelConfig(family="dense", width=768, blocks=4), 1),
    (ModelConfig(family="dense", width=1024, blocks=5), 1),
]:
    model = build_model(mcfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    ev = make_eval_fn(model, params)
    m = dataclasses.replace(cfg.mcts, leaf_batch=k)

    @jax.jit
    def f(rng, m=m, ev=ev):
        return run_mcts(env, ev, boards, players, mc, dones, rng, m).visit_counts

    o = f(jax.random.PRNGKey(0)); jax.block_until_ready(o)
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        o = f(jax.random.PRNGKey(i))
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{mcfg.family} w={mcfg.width} c={mcfg.channels} b={mcfg.blocks} "
          f"K={k} params={n_params/1e6:.2f}M: {dt*1e3:.1f} ms/search -> "
          f"{B/dt:,.0f} env-steps/s bound")

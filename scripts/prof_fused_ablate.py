"""Phase ablation of the whole-move fused kernel on the real chip.

Patches pieces of search/pallas_fused out (network forward, backup loop,
leaf reconstruction) to attribute the per-move budget: results drive which
kernel optimization pays (bench config: connect4, B=512, 200 sims).
"""
import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search import pallas_fused as F
from alphazero_tpu.search import pallas_mcts as P

cfg = preset("connect4")
env = make_env(cfg.env)
B = 512
boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mc = jnp.zeros((B,), jnp.int32)
dones = jnp.zeros((B,), jnp.bool_)

model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
ev = make_eval_fn(model, params)

orig_forward = F._dense_forward


def fake_forward(env, model, wrefs, obs, W_lines):
    A = env.action_dim
    Bl = obs.shape[1]
    probs = jnp.full((A, Bl), 1.0 / A, jnp.float32)
    value = jnp.zeros((1, Bl), jnp.float32)
    return probs, value


def timed(tag):
    @jax.jit
    def f(rng):
        return F.run_mcts_fused(env, model, params, ev, boards, players,
                                mc, dones, rng, cfg.mcts).visit_counts

    t0 = time.perf_counter()
    o = f(jax.random.PRNGKey(0))
    jax.block_until_ready(o)
    print(f"[{tag}] compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        o = f(jax.random.PRNGKey(i))
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] {dt * 1e3:.2f} ms/move -> {B / dt:,.0f} steps/s bound")
    return dt


full = timed("full")

F._dense_forward = fake_forward
no_fwd = timed("no-forward")

F._dense_forward = orig_forward

print(f"\nforward:    {1e3 * (full - no_fwd):.2f} ms")
print(f"search (descend+backup+loop): {1e3 * no_fwd:.2f} ms")

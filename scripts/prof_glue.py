"""Attribute the per-move XLA glue around the fused search kernel.

Times the full self-play runner chunk (bench config) vs the same chunk with
``run_mcts`` stubbed to a constant result: the difference is the search, the
stub time is the glue (root obs, action sampling, env step, trajectory
record, augmentation + buffer writes, auto-reset).
"""
import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.search import mcts as M
from alphazero_tpu.training import selfplay as SP

cfg = preset("connect4")
env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
B = cfg.train.selfplay_batch
STEPS = 8


def run_chunk(tag):
    runner = SP.make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                     num_steps=STEPS, donate=False)
    sp = SP.init_selfplay(env, B, jax.random.PRNGKey(1))
    buffer = create(env, cfg.replay.capacity)
    t0 = time.perf_counter()
    o = runner(params, sp, buffer)
    jax.block_until_ready(o[0].env_steps)
    print(f"[{tag}] compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        sp, buffer = runner(params, sp, buffer)
    jax.block_until_ready(sp.env_steps)
    dt = (time.perf_counter() - t0) / (n * STEPS)
    print(f"[{tag}] {dt * 1e3:.2f} ms/move -> {B / dt:,.0f} env-steps/s")
    return dt


full = run_chunk("full")

orig = M.run_mcts


def stub_mcts(env_, eval_fn, boards, players, move_counts, dones, rng,
              mcts_cfg, **kw):
    B_ = boards.shape[0]
    A = env_.action_dim
    valid = jax.vmap(env_.valid_mask_board)(boards, move_counts)
    counts = valid.astype(jnp.int32)
    pol = counts.astype(jnp.float32)
    pol = pol / jnp.maximum(pol.sum(-1, keepdims=True), 1.0)
    return M.SearchResult(visit_counts=counts, policy=pol,
                          root_q=jnp.zeros((B_,), jnp.float32), tree=None)


M.run_mcts = stub_mcts
SP.run_mcts = stub_mcts
glue = run_chunk("search-stubbed (pure glue)")
M.run_mcts = orig
SP.run_mcts = orig

print(f"\nsearch kernel+prep: {1e3 * (full - glue):.2f} ms/move")
print(f"glue (traj/buffer/env/sampling): {1e3 * glue:.2f} ms/move")

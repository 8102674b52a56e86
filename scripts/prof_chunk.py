"""Profile the multi-move self-play chunk kernel on the real chip.

Measures the full runner (bench config), the chunk kernel alone, the
kernel with the dense forward stubbed out (search-only bound), and B/M
scaling — drives which lever to pull next (VERDICT r1 #1).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.search import pallas_fused as F
from alphazero_tpu.training import selfplay as SP

cfg = preset("connect4")
env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))


def time_runner(B, M, tag, n=4):
    runner = SP.make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                     num_steps=M, donate=False)
    sp = SP.init_selfplay(env, B, jax.random.PRNGKey(1))
    buffer = create(env, cfg.replay.capacity)
    t0 = time.perf_counter()
    sp, buffer = runner(params, sp, buffer)
    int(sp.games_done)   # host fetch: block_until_ready doesn't block
    print(f"[{tag}] compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        sp, buffer = runner(params, sp, buffer)
    int(sp.games_done)   # through the IFRT proxy (fetch forces completion)
    dt = (time.perf_counter() - t0) / (n * M)
    print(f"[{tag}] B={B} M={M}: {dt * 1e3:.2f} ms/move -> "
          f"{B / dt:,.0f} env-steps/s", flush=True)
    return dt


def time_kernel_only(B, M, tag, n=4):
    boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
    players = jnp.zeros((B,), jnp.int32)
    mcs = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def f(rng):
        rec = F.run_selfplay_chunk_fused(env, model, params, boards,
                                         players, mcs, rng, cfg.mcts, M)
        return rec["policy"]

    t0 = time.perf_counter()
    o = f(jax.random.PRNGKey(0))
    float(o.sum())       # host fetch: block_until_ready doesn't block
    print(f"[{tag}] compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(n):
        o = f(jax.random.PRNGKey(i))
    float(o.sum())       # through the IFRT proxy (fetch forces completion)
    dt = (time.perf_counter() - t0) / (n * M)
    print(f"[{tag}] B={B} M={M}: {dt * 1e3:.2f} ms/move -> "
          f"{B / dt:,.0f} env-steps/s bound", flush=True)
    return dt


def fake_forward(env_, model_, wrefs, obs, W_lines, cfg=None):
    A = env_.action_dim
    Bl = obs.shape[1]
    s = jnp.sum(obs, axis=0, keepdims=True)
    probs = jnp.full((A, Bl), 1.0 / A, jnp.float32) + 0.0 * s
    value = 0.01 * s
    return probs, value


if __name__ == "__main__":
    import sys
    phases = sys.argv[1:] or ["split"]
    if "split" in phases:
        full = time_runner(512, 8, "runner-full")
        kern = time_kernel_only(512, 8, "kernel-only")
        orig = F._leaf_eval
        F._leaf_eval = fake_forward
        nofwd = time_kernel_only(512, 8, "kernel-no-forward")
        F._leaf_eval = orig
        print(f"\nglue (runner - kernel): {1e3 * (full - kern):.2f} ms/move")
        print(f"network forward: {1e3 * (kern - nofwd):.2f} ms/move")
        print(f"search bookkeeping: {1e3 * nofwd:.2f} ms/move")
    if "b1024" in phases:
        time_runner(1024, 8, "runner-B1024")
    if "b1024k" in phases:
        time_kernel_only(1024, 8, "kernel-B1024")
    if "m16" in phases:
        time_runner(512, 16, "runner-M16")

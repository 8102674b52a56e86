"""Attribute the per-chunk glue around the chunk kernel: Dirichlet noise
generation, trajectory-slab writes, augmentation + ring-buffer scatters."""
import sys
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.data.augment import Symmetries
from alphazero_tpu.envs import make_env
from alphazero_tpu.training import selfplay as SP

cfg = preset("connect4")
env = make_env(cfg.env)
B, M, L, A = 512, 8, env.max_moves, env.action_dim
syms = Symmetries(env)


def timeit(tag, f, *args, n=6):
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    print(f"[{tag}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] {dt*1e3:.2f} ms/chunk = {dt*1e3/M:.2f} ms/move", flush=True)
    return dt


# 1. Dirichlet noise generation (M, B, A)
@jax.jit
def gen_noise(rng):
    return jax.random.dirichlet(
        rng, jnp.full((A,), 0.3, jnp.float32), shape=(M, B))


timeit("dirichlet", gen_noise, jax.random.PRNGKey(0))


# 2. record scan without buffer writes (slab updates only)
def make_scan(with_flush: bool):
    @jax.jit
    def f(sp_slabs, buffer, rec):
        traj_obs, traj_policy, traj_player = sp_slabs

        def mbody(carry, r):
            to, tp, tpl, buf = carry
            if with_flush:
                to, tp, tpl, buf = SP._record_and_flush(
                    env, cfg.replay, syms, to, tp, tpl, r["t"], r["obs"],
                    r["policy"], r["player"], r["done"], r["winner"], buf)
            else:
                at_t = (jnp.arange(L)[None, :] == r["t"][:, None])
                to = jnp.where(at_t[:, :, None, None, None],
                               r["obs"][:, None], to)
                tp = jnp.where(at_t[:, :, None], r["policy"][:, None], tp)
                tpl = jnp.where(at_t, r["player"][:, None], tpl)
            return (to, tp, tpl, buf), None

        (to, tp, tpl, buf), _ = jax.lax.scan(
            mbody, (traj_obs, traj_policy, traj_player, buffer), rec)
        return to, buf

    return f


rec = {
    "t": jnp.zeros((M, B), jnp.int32),
    "obs": jnp.zeros((M, B, env.feature_dim, env.rows, env.cols), jnp.int8),
    "policy": jnp.zeros((M, B, A), jnp.float32),
    "player": jnp.zeros((M, B), jnp.int32),
    "done": jnp.zeros((M, B), bool).at[3].set(True),
    "winner": jnp.zeros((M, B), jnp.int32),
}
slabs = (jnp.zeros((B, L, env.feature_dim, env.rows, env.cols), jnp.int8),
         jnp.zeros((B, L, A), jnp.float32),
         jnp.zeros((B, L), jnp.int32))
buffer = create(env, cfg.replay.capacity)

timeit("slab-writes-only", make_scan(False), slabs, buffer, rec)
timeit("record+flush", make_scan(True), slabs, buffer, rec)

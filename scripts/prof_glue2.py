"""Attribute the per-chunk glue around the chunk kernel: Dirichlet noise
generation, trajectory-slab writes, game-block flush, record reshapes."""
import sys
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import add_games, create
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
    float(jax.tree.leaves(o)[0].sum())      # host fetch forces completion
    print(f"[{tag}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    float(jax.tree.leaves(o)[0].sum())
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] {dt*1e3:.2f} ms/chunk = {dt*1e3/M:.2f} ms/move",
          flush=True)
    return dt


# 1. Dirichlet noise generation (M, B, A)
@jax.jit
def gen_noise(rng):
    return jax.random.dirichlet(
        rng, jnp.full((A,), 0.3, jnp.float32), shape=(M, B)).sum()


timeit("dirichlet", gen_noise, jax.random.PRNGKey(0))


# 2. record scan: slab writes only vs slab writes + game-block flush
def make_scan(with_flush: bool):
    @jax.jit
    def f(slabs, buffer, rec):
        traj_obs, traj_policy = slabs

        def mbody(carry, r):
            to, tp, buf = carry
            if with_flush:
                to, tp, buf = SP._record_and_flush(
                    env, cfg.replay, syms, to, tp, r["t"], r["obs"],
                    r["policy"], r["done"], r["winner"], buf)
            else:
                at_t = (jnp.arange(L)[None, :] == r["t"][:, None])
                to = jnp.where(at_t[:, :, None, None, None],
                               r["obs"][:, None], to)
                tp = jnp.where(at_t[:, :, None], r["policy"][:, None], tp)
            return (to, tp, buf), None

        (to, tp, buf), _ = jax.lax.scan(
            mbody, (traj_obs, traj_policy, buffer), rec)
        return to.sum(), buf.length.sum()

    return f


rec = {
    "t": jnp.zeros((M, B), jnp.int32),
    "obs": jnp.zeros((M, B, env.feature_dim, env.rows, env.cols), jnp.int8),
    "policy": jnp.zeros((M, B, A), jnp.float32),
    "done": jnp.zeros((M, B), bool).at[3].set(True),
    "winner": jnp.zeros((M, B), jnp.int32),
}
slabs = (jnp.zeros((B, L, env.feature_dim, env.rows, env.cols), jnp.int8),
         jnp.zeros((B, L, A), jnp.float32))
buffer = create(env, cfg.replay.capacity)

timeit("slab-writes-only", make_scan(False), slabs, buffer, rec)
timeit("record+block-flush", make_scan(True), slabs, buffer, rec)


# 3. the record reshapes/transposes from kernel layout (run_selfplay glue)
ORCp = 128
@jax.jit
def reshape_records(obs_o, pol_o, meta_o, board_o):
    F = env.feature_dim
    RC = env.rows * env.cols
    obs_m = obs_o.reshape(M, ORCp, B)[:, :F * RC].transpose(0, 2, 1) \
        .reshape(M, B, F, env.rows, env.cols).astype(jnp.int8)
    pol_m = pol_o.reshape(M, 8, B)[:, :A].transpose(0, 2, 1)
    board_f = (board_o.transpose(2, 0, 1) > 0.5).reshape(
        B, 2, env.rows, env.cols).astype(jnp.int8)
    return obs_m.sum(), pol_m.sum(), board_f.sum()


timeit("record-reshapes", reshape_records,
       jnp.zeros((M * ORCp, B)), jnp.zeros((M * 8, B)),
       jnp.zeros((M * 8, B)), jnp.zeros((2, 42, B)))

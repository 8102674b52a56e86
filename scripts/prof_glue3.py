"""Fresh glue attribution for the fused chunk runner (round 5).

(runner − kernel-only) at M=8 measured 1.49 ms/move — far above the
assumed ~0.4.  This script times each glue component of
training/selfplay.py:selfplay_chunk_fused at the production M=32 so the
optimization targets the real cost.  Components:

  noise-prep      Dirichlet + uniform generation and kernel-layout packing
  kernel+outproc  run_selfplay_chunk_fused jitted, ALL outputs fetched
                  (kernel + t_mxu record transposes + int8 casts)
  kernel-policy   same but only rec['policy'] kept (XLA DCEs unused
                  output processing — prof_chunk's 'kernel-only' number)
  overlay-fold    the last-write-wins slab fold + staged add_games flush,
                  fed precomputed records
  full-chunk      selfplay_chunk_fused end-to-end
"""
import sys
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.data.augment import Symmetries
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.search import pallas_fused as F
from alphazero_tpu.training import selfplay as SP

cfg = preset("connect4")
env = make_env(cfg.env)
B = 512
M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
A, L = env.action_dim, env.max_moves
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
syms = Symmetries(env)


def timeit(tag, f, *args, n=5, per_move=True):
    t0 = time.perf_counter()
    o = f(*args)
    float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    print(f"[{tag}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    d = dt / M if per_move else dt
    print(f"[{tag}] {dt*1e3:.2f} ms/chunk = {d*1e3:.3f} ms/move", flush=True)
    return dt


# ---- noise prep (exact copy of run_selfplay_chunk_fused's input section)
Ap = F._pad8_local(A)


@jax.jit
def noise_prep(rng):
    rng_n, rng_u = jax.random.split(rng)
    noise = jax.random.dirichlet(
        rng_n, jnp.full((A,), cfg.mcts.dirichlet_alpha, jnp.float32),
        shape=(M, B)).astype(jnp.float32)
    noise_t = jnp.zeros((M, Ap, B), jnp.float32) \
        .at[:, :A, :].set(noise.transpose(0, 2, 1)).reshape(M * Ap, B)
    unif = jax.random.uniform(rng_u, (M, 1, B), jnp.float32)
    unif_t = jnp.zeros((M, 8, B), jnp.float32) \
        .at[:, :1, :].set(unif).reshape(M * 8, B)
    return noise_t, unif_t


timeit("noise-prep", noise_prep, jax.random.PRNGKey(0))

boards = jnp.zeros((B, 2, env.rows, env.cols), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mcs = jnp.zeros((B,), jnp.int32)


@jax.jit
def kernel_all(rng):
    return F.run_selfplay_chunk_fused(env, model, params, boards, players,
                                      mcs, rng, cfg.mcts, M)


@jax.jit
def kernel_policy(rng):
    return F.run_selfplay_chunk_fused(env, model, params, boards, players,
                                      mcs, rng, cfg.mcts, M)["policy"]


timeit("kernel-policy", kernel_policy, jax.random.PRNGKey(0))
t0 = time.perf_counter()
rec = kernel_all(jax.random.PRNGKey(0))
float(np.asarray(rec["policy"]).ravel()[0])
print(f"[kernel+outproc] compile {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(5):
    rec = kernel_all(jax.random.PRNGKey(0))
# fetch one element of EVERY output so nothing is DCE'd or left unexecuted
for k in ("obs", "policy", "player", "t", "action", "done", "winner",
          "root_q", "board", "player_final", "mc_final"):
    float(np.asarray(rec[k]).ravel()[0])
dt = (time.perf_counter() - t0) / 5
print(f"[kernel+outproc] {dt*1e3:.2f} ms/chunk = {dt*1e3/M:.3f} ms/move",
      flush=True)

# ---- overlay fold + flush, fed precomputed records (device-resident)
rec = jax.tree.map(jnp.asarray, rec)
sp = SP.init_selfplay(env, B, jax.random.PRNGKey(1))
buffer = create(env, cfg.replay.capacity)


@jax.jit
def fold(sp, buffer, rec):
    # replicate selfplay_chunk_fused's fold body
    FRC = int(np.prod(sp.traj_obs.shape[2:]))
    lr = jnp.arange(L)[None, :]
    obs_flat = rec["obs"].reshape(M, B, FRC).astype(jnp.float32)

    def overlay(slab_obs, slab_pol, m_cap):
        mi = jnp.arange(M)[:, None, None]
        hit = ((rec["t"][:, :, None] == lr[None])
               & (mi <= m_cap[None, :, None]))
        wm = jnp.max(jnp.where(hit, mi + 1, 0), axis=0)
        sel = (hit & (mi + 1 == wm[None])).astype(jnp.float32)
        any_w = wm > 0
        up_obs = jnp.einsum("mbl,mbx->blx", sel, obs_flat,
                            preferred_element_type=jnp.float32)
        up_pol = jnp.einsum("mbl,mba->bla", sel, rec["policy"],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        new_obs = jnp.where(any_w[:, :, None], up_obs.astype(jnp.int8),
                            slab_obs.reshape(B, L, FRC)).reshape(
            slab_obs.shape)
        new_pol = jnp.where(any_w[:, :, None], up_pol, slab_pol)
        return new_obs, new_pol

    from alphazero_tpu.data import add_games
    min_len = 2 * env.win_len - 1
    n_stages = 1 + (M - 1) // min_len
    cum = jnp.cumsum(rec["done"].astype(jnp.int32), axis=0)
    buffer_new = buffer
    for s in range(n_stages):
        event = rec["done"] & (cum == s + 1)
        fired = event.any(axis=0)
        ev = event.astype(jnp.int32)
        m_s = jnp.where(fired, jnp.argmax(ev, axis=0), -1)
        length_s = (ev * (rec["t"] + 1)).sum(axis=0)
        winner_s = jnp.where(fired, (ev * rec["winner"]).sum(axis=0), -1)
        st_obs, st_pol = overlay(sp.traj_obs, sp.traj_policy, m_s)
        buffer_new = add_games(buffer_new, st_obs, st_pol, length_s,
                               winner_s, fired)
    to, tp = overlay(sp.traj_obs, sp.traj_policy,
                     jnp.full((B,), M - 1, jnp.int32))
    return to.sum(), buffer_new.size


timeit("overlay-fold", fold, sp, buffer, rec)


# ---- full chunk
@jax.jit
def full(params, sp, buffer):
    return SP.selfplay_chunk_fused(env, model, params, cfg.mcts, cfg.replay,
                                   syms, sp, buffer, M)


def full_fetch(params, sp, buffer):
    sp2, buf2 = full(params, sp, buffer)
    return sp2


t0 = time.perf_counter()
o = full_fetch(params, sp, buffer)
int(o.games_done)
print(f"[full-chunk] compile {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(5):
    o = full_fetch(params, sp, buffer)
int(o.games_done)
dt = (time.perf_counter() - t0) / 5
print(f"[full-chunk] {dt*1e3:.2f} ms/chunk = {dt*1e3/M:.3f} ms/move",
      flush=True)

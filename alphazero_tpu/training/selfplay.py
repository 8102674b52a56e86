"""Batched self-play actor: whole games advance in lockstep under ``jit``.

Replaces the reference's one-game-at-a-time Python loop
(train.collect_data → Game.self_play, train.py:54-83, gomoku.py:123-164)
with B concurrent games: every move step runs one batched MCTS (all leaf
evals fused into single forwards), records (observation, π, player) into
per-game trajectory slabs, steps all envs, flushes finished games through
symmetry augmentation into the device replay buffer, and auto-resets them —
so every step advances B live games (continuous batching).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_tpu.config import MCTSConfig, ReplayConfig
from alphazero_tpu.data.augment import Symmetries
from alphazero_tpu.data.replay import ReplayBuffer, add_games
from alphazero_tpu.envs.core import EnvState
from alphazero_tpu.search.mcts import run_mcts


@struct.dataclass
class SelfPlayState:
    """Carry of the jitted self-play loop for one device batch of B games."""

    env_state: EnvState      # batched (B,)
    traj_obs: jax.Array      # (B, L, F, R, C) int8 — canonical obs per move
    traj_policy: jax.Array   # (B, L, A) float32 — root visit distributions
    t: jax.Array             # (B,) int32 — moves played in current game
    rng: jax.Array
    games_done: jax.Array    # () int32 — completed games (cumulative)
    env_steps: jax.Array     # () int32 — total moves made (cumulative)
    results: jax.Array       # (3,) int32 — p0 wins / p1 wins / draws
                             #   (the reference's game_results, train.py:58)


def init_selfplay(env, batch_size: int, rng) -> SelfPlayState:
    B, L, A = batch_size, env.max_moves, env.action_dim
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    return SelfPlayState(
        env_state=states,
        traj_obs=jnp.zeros((B, L, env.feature_dim, env.rows, env.cols), jnp.int8),
        traj_policy=jnp.zeros((B, L, A), jnp.float32),
        t=jnp.zeros((B,), jnp.int32),
        rng=rng,
        games_done=jnp.int32(0),
        env_steps=jnp.int32(0),
        results=jnp.zeros((3,), jnp.int32),
    )


def _record_and_flush(env, replay_cfg: ReplayConfig, syms: Symmetries,
                      traj_obs, traj_policy, t, obs, policy, done_now,
                      winner, buffer):
    """Shared per-move trajectory bookkeeping: record the position at row
    ``t`` of each game's slab (masked full-array writes — XLA lowers
    per-game row scatters serially on TPU, a where-select streams at HBM
    speed), then flush finished games' whole slabs as replay blocks (one
    B-index block scatter; augmentation and value targets happen at sample
    time, data/replay.py).  Returns (traj_obs, traj_policy, buffer)."""
    B, L = traj_policy.shape[:2]
    at_t = jnp.arange(L)[None, :] == t[:, None]               # (B, L)
    traj_obs = jnp.where(at_t[:, :, None, None, None],
                         obs[:, None], traj_obs)
    traj_policy = jnp.where(at_t[:, :, None], policy[:, None], traj_policy)
    buffer = add_games(buffer, traj_obs, traj_policy, t + 1, winner,
                       done_now)
    return traj_obs, traj_policy, buffer


def _results_update(results, done_now, winner):
    """W/L/D counters (the reference's game_results, train.py:58)."""
    return (results + jnp.array([0, 0, 0], jnp.int32)
            .at[0].add((done_now & (winner == 0)).sum())
            .at[1].add((done_now & (winner == 1)).sum())
            .at[2].add((done_now & (winner < 0)).sum()))


def selfplay_step(env, eval_fn, mcts_cfg: MCTSConfig, replay_cfg: ReplayConfig,
                  syms: Symmetries, sp: SelfPlayState,
                  buffer: ReplayBuffer) -> Tuple[SelfPlayState, ReplayBuffer]:
    """One lockstep move for all B games (= B env steps)."""
    B = sp.t.shape[0]
    rng, mcts_rng, act_rng = jax.random.split(sp.rng, 3)
    s = sp.env_state

    # --- search (root Dirichlet on, as in self-play; gomoku.py:136)
    res = run_mcts(env, eval_fn, s.board, s.current_player, s.move_count,
                   s.done, mcts_rng, mcts_cfg)

    obs = jax.vmap(env.observation)(s).astype(jnp.int8)

    # --- temperature: visit-sample early moves, argmax later (gomoku.py:144)
    logits = jnp.where(res.visit_counts > 0,
                       jnp.log(jnp.maximum(res.policy, 1e-30)), -jnp.inf)
    sampled = jax.random.categorical(act_rng, logits).astype(jnp.int32)
    greedy = jnp.argmax(res.visit_counts, axis=-1).astype(jnp.int32)
    action = jnp.where(sp.t < mcts_cfg.temperature_moves, sampled, greedy)

    new_state = jax.vmap(env.step)(s, action)
    done_now = new_state.done
    winner = new_state.winner

    # --- record position BEFORE the move (train.py:37, gomoku.py:138-140)
    # + flush finished games into the replay buffer
    traj_obs, traj_policy, buffer = _record_and_flush(
        env, replay_cfg, syms, sp.traj_obs, sp.traj_policy,
        sp.t, obs, res.policy, done_now, winner, buffer)

    # --- auto-reset finished games
    fresh = jax.vmap(lambda _: env.init())(jnp.arange(B))
    env_state = jax.tree.map(
        lambda f, n: jnp.where(
            done_now.reshape((B,) + (1,) * (n.ndim - 1)), f, n
        ),
        fresh, new_state,
    )

    return sp.replace(
        env_state=env_state,
        traj_obs=traj_obs,
        traj_policy=traj_policy,
        t=jnp.where(done_now, 0, sp.t + 1),
        rng=rng,
        games_done=sp.games_done + done_now.sum(),
        env_steps=sp.env_steps + B,
        results=_results_update(sp.results, done_now, winner),
    ), buffer


def selfplay_chunk_fused(env, model, params, mcts_cfg: MCTSConfig,
                         replay_cfg: ReplayConfig, syms: Symmetries,
                         sp: SelfPlayState, buffer: ReplayBuffer,
                         num_steps: int, interpret: bool = False
                         ) -> Tuple[SelfPlayState, ReplayBuffer]:
    """``num_steps`` lockstep moves in ONE whole-chunk Pallas kernel
    (search/pallas_fused.py:_chunk_kernel): root eval, search, action
    selection, env stepping and auto-reset all run on-core; this wrapper
    folds the kernel's per-move records into the trajectory slabs and
    replay buffer (identical bookkeeping to the per-move path via
    _record_and_flush)."""
    from alphazero_tpu.envs.core import EnvState
    from alphazero_tpu.search.pallas_fused import run_selfplay_chunk_fused

    B = sp.t.shape[0]
    M = num_steps
    rng, krng = jax.random.split(sp.rng)
    # invariant of both runners: entering a step, every game is live
    # (finished games were reset by the previous step)
    rec = run_selfplay_chunk_fused(
        env, model, params, sp.env_state.board, sp.env_state.current_player,
        sp.env_state.move_count, krng, mcts_cfg, M, interpret=interpret)

    # ---- fold all M records into the slabs at once, flush finished games
    # per done-EVENT (a game can finish at most 1 + (M-1)//min_len times in
    # an M-move chunk; each later finisher played a full game in-chunk).
    # Per (game, row) the LAST chunk write wins — overlay via one einsum
    # against a last-write-wins selection mask instead of M sequential
    # full-slab passes (measured: the per-move scan cost 2.1 ms/move).
    L = sp.traj_obs.shape[1]
    FRC = int(np.prod(sp.traj_obs.shape[2:]))
    A = sp.traj_policy.shape[2]
    lr = jnp.arange(L)[None, :]
    obs_flat = rec["obs"].reshape(M, B, FRC).astype(jnp.float32)

    def overlay(slab_obs, slab_pol, m_cap):
        """Slabs with every record (m ≤ m_cap[b], last write wins) applied.

        Last-write-wins as one max-reduction over the chunk axis instead
        of a reversed M-step mask accumulation — the loop form created a
        chain of ~M dependent (B, L) ops per overlay (×6 overlays/chunk),
        pure serialized dispatch latency."""
        mi = jnp.arange(M)[:, None, None]                     # (M, 1, 1)
        hit = ((rec["t"][:, :, None] == lr[None])             # (M, B, L)
               & (mi <= m_cap[None, :, None]))
        wm = jnp.max(jnp.where(hit, mi + 1, 0), axis=0)       # (B, L)
        sel = (hit & (mi + 1 == wm[None])).astype(jnp.float32)  # (M, B, L)
        any_w = wm > 0                                         # (B, L)
        # HIGHEST: exact f32 for the policy overlay (default matmul
        # precision is single-pass bf16 on TPU)
        up_obs = jnp.einsum("mbl,mbx->blx", sel, obs_flat,
                            preferred_element_type=jnp.float32)
        up_pol = jnp.einsum("mbl,mba->bla", sel, rec["policy"],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        new_obs = jnp.where(any_w[:, :, None],
                            up_obs.astype(jnp.int8),
                            slab_obs.reshape(B, L, FRC)).reshape(
            slab_obs.shape)
        new_pol = jnp.where(any_w[:, :, None], up_pol, slab_pol)
        return new_obs, new_pol

    min_len = 2 * env.win_len - 1          # shortest decided game
    n_stages = 1 + (M - 1) // min_len
    cum = jnp.cumsum(rec["done"].astype(jnp.int32), axis=0)   # (M, B)
    buffer_new = buffer
    for s in range(n_stages):
        event = rec["done"] & (cum == s + 1)                  # (M, B)
        fired = event.any(axis=0)                             # (B,)
        ev = event.astype(jnp.int32)
        m_s = jnp.where(fired, jnp.argmax(ev, axis=0), -1)    # (B,)
        length_s = (ev * (rec["t"] + 1)).sum(axis=0)          # t_done + 1
        winner_s = jnp.where(fired, (ev * rec["winner"]).sum(axis=0), -1)
        st_obs, st_pol = overlay(sp.traj_obs, sp.traj_policy, m_s)
        buffer_new = add_games(buffer_new, st_obs, st_pol, length_s,
                               winner_s, fired)
    buffer = buffer_new
    traj_obs, traj_policy = overlay(sp.traj_obs, sp.traj_policy,
                                    jnp.full((B,), M - 1, jnp.int32))

    env_state = EnvState(
        board=rec["board"],
        current_player=rec["player_final"],
        move_count=rec["mc_final"],
        winner=jnp.full((B,), -1, jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )
    d, w = rec["done"], rec["winner"]                          # (M, B)
    results = sp.results + jnp.stack(
        [(d & (w == 0)).sum(), (d & (w == 1)).sum(),
         (d & (w < 0)).sum()]).astype(jnp.int32)
    return sp.replace(
        env_state=env_state,
        traj_obs=traj_obs,
        traj_policy=traj_policy,
        t=rec["mc_final"],
        rng=rng,
        games_done=sp.games_done + rec["done"].sum(),
        env_steps=sp.env_steps + M * B,
        results=results,
    ), buffer


def make_selfplay_runner(env, model, mcts_cfg: MCTSConfig,
                         replay_cfg: ReplayConfig, num_steps: int,
                         donate: bool = True) -> Callable:
    """Build a jitted runner advancing all games ``num_steps`` moves:
    ``runner(params, sp, buffer) -> (sp, buffer)``.

    Fast path (dense model family on TPU): ALL ``num_steps`` moves run in
    one whole-chunk Pallas kernel (search/pallas_fused.py:_chunk_kernel) —
    root evals, searches, env steps and resets never leave the core.
    Otherwise each move runs a batched search (Pallas or XLA engine via
    run_mcts) with flax leaf evaluation, scanned ``num_steps`` times."""
    syms = Symmetries(env)

    from alphazero_tpu.models.dense import DenseTower
    from alphazero_tpu.search.pallas_fused import supports_selfplay_fused

    def run(params, sp: SelfPlayState, buffer: ReplayBuffer):
        B = sp.t.shape[0]
        if (isinstance(model, DenseTower)
                and supports_selfplay_fused(env, B, mcts_cfg, model)):
            return selfplay_chunk_fused(env, model, params, mcts_cfg,
                                        replay_cfg, syms, sp, buffer,
                                        num_steps)

        # fastest inference forward for the family (fused resnet tower /
        # dense_spec for the whole-move kernel)
        from alphazero_tpu.models import make_eval_fn
        eval_fn = make_eval_fn(model, params)

        def body(carry, _):
            sp, buffer = carry
            sp, buffer = selfplay_step(env, eval_fn, mcts_cfg, replay_cfg,
                                       syms, sp, buffer)
            return (sp, buffer), None

        (sp, buffer), _ = jax.lax.scan(body, (sp, buffer), None,
                                       length=num_steps)
        return sp, buffer

    return jax.jit(run, donate_argnums=(1, 2) if donate else ())

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
from flax import struct

from alphazero_tpu.config import MCTSConfig, ReplayConfig
from alphazero_tpu.data.augment import Symmetries
from alphazero_tpu.data.replay import ReplayBuffer, add_batch
from alphazero_tpu.envs.core import EnvState
from alphazero_tpu.search.mcts import run_mcts


@struct.dataclass
class SelfPlayState:
    """Carry of the jitted self-play loop for one device batch of B games."""

    env_state: EnvState      # batched (B,)
    traj_obs: jax.Array      # (B, L, F, R, C) int8 — canonical obs per move
    traj_policy: jax.Array   # (B, L, A) float32 — root visit distributions
    traj_player: jax.Array   # (B, L) int32
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
        traj_player=jnp.zeros((B, L), jnp.int32),
        t=jnp.zeros((B,), jnp.int32),
        rng=rng,
        games_done=jnp.int32(0),
        env_steps=jnp.int32(0),
        results=jnp.zeros((3,), jnp.int32),
    )


def selfplay_step(env, eval_fn, mcts_cfg: MCTSConfig, replay_cfg: ReplayConfig,
                  syms: Symmetries, sp: SelfPlayState,
                  buffer: ReplayBuffer) -> Tuple[SelfPlayState, ReplayBuffer]:
    """One lockstep move for all B games (= B env steps)."""
    B = sp.t.shape[0]
    L = sp.traj_obs.shape[1]
    rng, mcts_rng, act_rng = jax.random.split(sp.rng, 3)
    s = sp.env_state

    # --- search (root Dirichlet on, as in self-play; gomoku.py:136)
    res = run_mcts(env, eval_fn, s.board, s.current_player, s.move_count,
                   s.done, mcts_rng, mcts_cfg)

    obs = jax.vmap(env.observation)(s).astype(jnp.int8)

    # --- record position BEFORE the move (train.py:37, gomoku.py:138-140).
    # Masked full-array writes: XLA lowers per-game row scatters serially
    # on TPU (see ops/gather.py), a where-select streams at HBM speed.
    at_t = jnp.arange(L)[None, :] == sp.t[:, None]            # (B, L)
    traj_obs = jnp.where(at_t[:, :, None, None, None],
                         obs[:, None], sp.traj_obs)
    traj_policy = jnp.where(at_t[:, :, None], res.policy[:, None],
                            sp.traj_policy)
    traj_player = jnp.where(at_t, s.current_player[:, None], sp.traj_player)

    # --- temperature: visit-sample early moves, argmax later (gomoku.py:144)
    logits = jnp.where(res.visit_counts > 0,
                       jnp.log(jnp.maximum(res.policy, 1e-30)), -jnp.inf)
    sampled = jax.random.categorical(act_rng, logits).astype(jnp.int32)
    greedy = jnp.argmax(res.visit_counts, axis=-1).astype(jnp.int32)
    action = jnp.where(sp.t < mcts_cfg.temperature_moves, sampled, greedy)

    new_state = jax.vmap(env.step)(s, action)
    done_now = new_state.done
    winner = new_state.winner

    # --- flush finished games through augmentation into the replay buffer
    # value target: pure game outcome with parity alternation (train.py:33-36)
    irange = jnp.arange(L)
    played = irange[None, :] <= sp.t[:, None]              # (B, L) recorded rows
    targets = jnp.where(
        winner[:, None] < 0,
        0.0,
        jnp.where(traj_player == winner[:, None], 1.0, -1.0),
    ).astype(jnp.float32)
    flush = done_now[:, None] & played
    flat_obs = traj_obs.reshape(B * L, *traj_obs.shape[2:])
    flat_pol = traj_policy.reshape(B * L, -1)
    flat_val = targets.reshape(B * L)
    for s_idx in range(syms.num if replay_cfg.augment else 1):
        if s_idx == 0:
            m = flush
        else:
            # first `skip` moves of each game get only the identity row
            # (empty/near-empty boards, train.py:39; SURVEY.md §2.4-9)
            m = flush & (irange[None, :] >= replay_cfg.augment_skip_moves)
        so, sp_pol = syms.apply(s_idx, flat_obs, flat_pol)
        buffer = add_batch(buffer, so, sp_pol, flat_val, m.reshape(B * L))

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
        traj_player=traj_player,
        t=jnp.where(done_now, 0, sp.t + 1),
        rng=rng,
        games_done=sp.games_done + done_now.sum(),
        env_steps=sp.env_steps + B,
        results=sp.results + jnp.array([0, 0, 0], jnp.int32)
            .at[0].add((winner == 0).sum())
            .at[1].add((winner == 1).sum())
            .at[2].add((done_now & (winner < 0)).sum()),
    ), buffer


def make_selfplay_runner(env, model, mcts_cfg: MCTSConfig,
                         replay_cfg: ReplayConfig, num_steps: int,
                         donate: bool = True) -> Callable:
    """Build a jitted runner advancing all games ``num_steps`` moves:
    ``runner(params, sp, buffer) -> (sp, buffer)``.

    Leaf evaluation uses the flax forward.  The fused Pallas tower
    (ops/pallas_resnet.py) is numerically verified but currently disabled:
    its Mosaic compile exceeds 10 minutes through this environment's
    remote-compile service (tracked for a future round)."""
    syms = Symmetries(env)
    fused_apply = None

    from alphazero_tpu.models.dense import DenseTower

    def run(params, sp: SelfPlayState, buffer: ReplayBuffer):
        def eval_fn(obs):
            if fused_apply is not None:
                logits, value = fused_apply(params, obs)
            else:
                logits, value = model.apply({"params": params}, obs,
                                            deterministic=True)
            return jax.nn.softmax(logits, axis=-1), value

        if isinstance(model, DenseTower):
            eval_fn.dense_spec = (model, params)  # whole-move fused kernel

        def body(carry, _):
            sp, buffer = carry
            sp, buffer = selfplay_step(env, eval_fn, mcts_cfg, replay_cfg,
                                       syms, sp, buffer)
            return (sp, buffer), None

        (sp, buffer), _ = jax.lax.scan(body, (sp, buffer), None,
                                       length=num_steps)
        return sp, buffer

    return jax.jit(run, donate_argnums=(1, 2) if donate else ())

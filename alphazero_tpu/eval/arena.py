"""Batched arena: model-vs-model and model-vs-vanilla matches.

Replaces the reference's sequential ``compete``/``compare`` (test.py:60-140)
with B concurrent games under one ``jit``: each move runs one batched MCTS
per agent over all boards and selects, per game, the action of whichever
agent is to move.  Side assignment swaps at B/2 (test.py:115-118) and draws
score half a point each (test.py:124-127).

This is the machinery behind REAL gating — the reference hardcodes the
contender win-rate to 0.6 (main.py:49, SURVEY.md §2.4-6)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.search.mcts import run_mcts


@dataclasses.dataclass(frozen=True)
class Agent:
    """One arena participant: a network evaluator or vanilla rollouts
    (``eval_fn=None``, as when the reference passes ``model=None``)."""

    eval_fn: Optional[Callable] = None
    mcts: MCTSConfig = MCTSConfig()
    # Reference arena searches keep root Dirichlet noise on (the default of
    # Game.mcts, gomoku.py:110-115, called from compete test.py:81-84).
    dirichlet: bool = True


def _agent_actions(env, agent: Agent, states, rng, t, sampling_moves: int):
    """This agent's action for every game (B,), given move index ``t``."""
    cfg = dataclasses.replace(agent.mcts, use_dirichlet=agent.dirichlet)
    res = run_mcts(env, agent.eval_fn, states.board, states.current_player,
                   states.move_count, states.done, rng, cfg)
    rng_s = jax.random.fold_in(rng, 1)
    logits = jnp.where(res.visit_counts > 0,
                       jnp.log(jnp.maximum(res.policy, 1e-30)), -jnp.inf)
    sampled = jax.random.categorical(rng_s, logits).astype(jnp.int32)
    greedy = jnp.argmax(res.visit_counts, axis=-1).astype(jnp.int32)
    # visit-sampling for the first `sampling_moves` moves (test.py:86-89)
    return jnp.where(t < sampling_moves, sampled, greedy)


def make_play_games(env, agent_a: Agent, agent_b: Agent,
                    sampling_moves: int = 0):
    """Build a jitted ``(rng, B) -> (winner_agent (B,))`` playing B full
    games with the side swap baked in: agent_a plays player 0 in games
    [0, B//2) and player 1 in [B//2, B) (test.py:115-118).  winner_agent:
    0 = agent_a, 1 = agent_b, -1 draw.

    Each move runs each agent's MCTS over only the HALF of the batch where
    that agent is to move: players strictly alternate from move 0 in
    lockstep (``env.step`` no-ops finished games without passing the turn),
    so at move t player ``t % 2`` is to move everywhere — agent_a's games
    are the low half at even t and the high half at odd t.  This halves the
    search work vs searching all B boards with both agents and discarding
    one side's result."""

    def play(rng, B: int):
        assert B % 2 == 0, "side swap needs an even game count"
        h = B // 2
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))

        def half(states, lo: bool):
            return jax.tree.map(lambda x: x[:h] if lo else x[h:], states)

        def body(t, carry):
            states, rng = carry
            rng, ka, kb = jax.random.split(rng, 3)
            even = (t % 2) == 0
            s_lo, s_hi = half(states, True), half(states, False)
            pick = lambda c, x, y: jax.tree.map(
                lambda a, b: jnp.where(c, a, b), x, y)
            s_a = pick(even, s_lo, s_hi)      # agent_a's games this move
            s_b = pick(even, s_hi, s_lo)
            act_a = _agent_actions(env, agent_a, s_a, ka, t, sampling_moves)
            act_b = _agent_actions(env, agent_b, s_b, kb, t, sampling_moves)
            action = jnp.concatenate([jnp.where(even, act_a, act_b),
                                      jnp.where(even, act_b, act_a)])
            states = jax.vmap(env.step)(states, action)
            return states, rng

        states, _ = jax.lax.fori_loop(0, env.max_moves, body, (states, rng))
        winner_player = states.winner                 # 0 / 1 / -1
        a_first = jnp.arange(B) < h
        a_won = (winner_player == 0) == a_first
        return jnp.where(winner_player < 0, -1,
                         jnp.where(a_won, 0, 1))

    return jax.jit(play, static_argnums=1)


def compare(env, best: Agent, contender: Agent, games: int, rng,
            sampling: bool = False,
            sampling_moves: int = 20) -> Tuple[float, np.ndarray]:
    """Head-to-head match with side swap at games//2 (test.py:106-140).

    Returns (contender win rate with draws as 0.5, [best, contender, draws]).
    All games run concurrently, so the reference's sequential early-stopping
    (test.py:131-137) is unnecessary — the full match costs one jit call.
    """
    play = make_play_games(env, best, contender,
                           sampling_moves=sampling_moves if sampling else 0)
    w = np.asarray(play(rng, games))
    best_w = float((w == 0).sum())
    cont_w = float((w == 1).sum())
    draws = float((w == -1).sum())
    score = np.array([best_w + 0.5 * draws, cont_w + 0.5 * draws, draws])
    return float(score[1] / games), score

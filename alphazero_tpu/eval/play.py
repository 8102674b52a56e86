"""Human-vs-agent play in the terminal (reference: test.play_against_agent,
test.py:9-58).

The agent side runs the batched MCTS with batch size 1; input parsing
follows the reference per game: "row col" for cell games (gomoku.py:117),
a single column number for connect4 (connect4.py:110-115)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.search.mcts import run_mcts


def parse_input(env, state, text: str) -> Optional[int]:
    """Parse a human move; None when invalid (reference returns None and
    reprompts, test.py:21-24)."""
    try:
        parts = text.split()
        if env.action_dim == env.cols and env.rows != 1:  # connect4: column
            action = int(parts[0])
        else:
            r, c = int(parts[0]), int(parts[1])
            action = r * env.cols + c
    except (ValueError, IndexError):
        return None
    if not (0 <= action < env.action_dim):
        return None
    mask = np.asarray(env.valid_mask(state))
    return action if mask[action] else None


def agent_move(env, eval_fn, state, rng, mcts_cfg: MCTSConfig,
               verbose: bool = True) -> int:
    """One MCTS move for a single game; prints per-action stats like the
    reference's child printout (test.py:44-46)."""
    batched = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
    res = run_mcts(env, eval_fn, batched.board, batched.current_player,
                   batched.move_count, batched.done, rng, mcts_cfg)
    counts = np.asarray(res.visit_counts)[0]
    if verbose:
        pi = counts / max(counts.sum(), 1)
        for a in np.nonzero(counts)[0]:
            print(f"  action {a}: visits={counts[a]} p={pi[a]:.3f}")
        print(f"  root Q: {float(res.root_q[0]):+.3f}")
    return int(counts.argmax())


def play_against_agent(env, eval_fn, mcts_cfg: MCTSConfig, human_turn: int,
                       input_fn=input, print_fn=print, rng_seed: int = 0):
    """Interactive loop; returns the winner (0/1, -1 draw)."""
    state = env.init()
    rng = jax.random.PRNGKey(rng_seed)
    cfg = dataclasses.replace(mcts_cfg, use_dirichlet=False)
    while True:
        print_fn(env.render(state))
        if int(state.current_player) == human_turn:
            action = parse_input(env, state, input_fn("your move> "))
            if action is None:
                print_fn("Invalid move. Try again.")
                continue
        else:
            rng, k = jax.random.split(rng)
            action = agent_move(env, eval_fn, state, k, cfg)
            print_fn(f"agent plays {action}")
        state = env.step(state, jnp.int32(action))
        if bool(state.done):
            print_fn(env.render(state))
            w = int(state.winner)
            print_fn("It's a draw!" if w < 0 else f"Player {w} wins!")
            return w

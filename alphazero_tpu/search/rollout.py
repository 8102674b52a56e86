"""Batched uniform-random rollouts for vanilla (model-free) MCTS.

The reference's leaf simulation (ai/mcts.py:62-79): play random legal moves
on a copy of the board until a win or a full board, and return ±1/0 from the
perspective of the player who moved into the leaf.  Vectorized over B games
with a single masked ``while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout_values(env, boards, players, move_counts, rng):
    """Random playouts from batched positions.

    Args:
      boards: (B, 2, R, C) int8; players: (B,) player to move; move_counts: (B,).
    Returns:
      (B,) float32 in {-1, 0, 1}: outcome from the perspective of the player
      who moved INTO the position, i.e. ``1 - players`` (ai/mcts.py:77-79).
    """
    B = boards.shape[0]

    def cond(carry):
        _, _, _, _, done, _ = carry
        return ~jnp.all(done)

    def body(carry):
        board, player, mc, winner, done, rng = carry
        rng, k = jax.random.split(rng)
        valid = jax.vmap(env.valid_mask_board)(board, mc)          # (B, A)
        has_valid = jnp.any(valid, axis=-1)
        logits = jnp.where(valid, 0.0, -jnp.inf)
        # categorical is undefined with all -inf; give stuck lanes action 0
        safe_logits = jnp.where(has_valid[:, None], logits, 0.0)
        action = jax.random.categorical(k, safe_logits).astype(jnp.int32)
        moved = ~done & has_valid
        new_board = jax.vmap(env.apply_action)(board, player, action)
        board = jnp.where(moved[:, None, None, None], new_board, board)
        mover_plane = jnp.take_along_axis(
            board, player[:, None, None, None], axis=1
        )[:, 0]
        won = env.won_batch(mover_plane) & moved
        winner = jnp.where(won, player, winner)
        mc = mc + moved.astype(jnp.int32)
        player = jnp.where(moved, 1 - player, player)
        done = done | won | (mc >= env.max_moves) | ~has_valid
        return board, player, mc, winner, done, rng

    winner0 = jnp.full((B,), -1, jnp.int32)
    done0 = jnp.zeros((B,), jnp.bool_)
    _, _, _, winner, _, _ = jax.lax.while_loop(
        cond, body, (boards, players, move_counts, winner0, done0, rng)
    )
    leaf_mover = 1 - players
    return jnp.where(
        winner < 0, 0.0, jnp.where(winner == leaf_mover, 1.0, -1.0)
    )

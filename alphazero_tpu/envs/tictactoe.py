"""TicTacToe: 3×3, 3-in-a-row (reference: games/tictactoe.py)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.envs.core import Env, EnvState, dihedral_perms


class TicTacToe(Env):
    """Actions are flat cells ``r * cols + c`` (reference tictactoe.py:31-35).

    feature_dim is 3 to match the reference board layout ``(3, 3, 3)`` with a
    to-move plane (tictactoe.py:17,41); channels 0/1 are canonicalized
    (SURVEY.md §2.4-1 fix making the game trainable).
    """

    name = "tictactoe"
    rows = 3
    cols = 3
    action_dim = 9
    max_moves = 9
    feature_dim = 3
    win_len = 3

    def place_cell(self, board: jax.Array, action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return action // self.cols, action % self.cols

    def valid_mask_board(self, board: jax.Array, move_count: jax.Array) -> jax.Array:
        return ((board[0] + board[1]) == 0).reshape(-1)

    def symmetries(self) -> Tuple[np.ndarray, np.ndarray]:
        perms = dihedral_perms(self.rows, self.cols)
        return perms, perms  # actions are cells

"""Connect-4: 6×7 with gravity, 4-in-a-row (reference: games/connect4.py)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.envs.core import Env, EnvState


class Connect4(Env):
    """Actions are columns (``action_dim = 7``, reference connect4.py:9-10,29).

    Gravity is a column-height count instead of the reference's bottom-up
    Python scan (connect4.py:32-41): the drop row is
    ``rows - 1 - (stones already in the column)``.
    """

    name = "connect4"
    rows = 6
    cols = 7
    action_dim = 7
    max_moves = 42
    feature_dim = 3
    win_len = 4

    def place_cell(self, board: jax.Array, action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        height = (board[0] + board[1])[:, action].sum().astype(jnp.int32)
        return self.rows - 1 - height, action

    def valid_mask_board(self, board: jax.Array, move_count: jax.Array) -> jax.Array:
        return (board[0, 0] + board[1, 0]) == 0

    def symmetries(self) -> Tuple[np.ndarray, np.ndarray]:
        """Identity + left-right flip only: gravity breaks rotations
        (the reference's dihedral-8 is invalid here, SURVEY.md §2.4-2)."""
        idx = np.arange(self.rows * self.cols).reshape(self.rows, self.cols)
        cell_perms = np.stack([idx.reshape(-1), np.fliplr(idx).reshape(-1)])
        cols = np.arange(self.cols)
        action_perms = np.stack([cols, cols[::-1]])
        return cell_perms, action_perms

"""Gomoku: N×N, 5-in-a-row (reference: games/gomoku.py).

The reference fixes the board size as a class constant (gomoku.py:10, playable
at 9×9/15×15 only by editing it); here size is a constructor argument so the
7×7 / 9×9 / 15×15 benchmark configs coexist.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.envs.core import Env, EnvState, dihedral_perms


class Gomoku(Env):
    """Actions are flat cells.  feature_dim is 2 — no to-move plane; the
    canonical observation swaps stone planes instead (gomoku.py:34-40).

    Valid moves are restricted to empty cells adjacent (8-neighborhood) to an
    existing stone, with the center as the sole opening move (gomoku.py:93-106)
    — computed here as a 3×3 max-pool dilation instead of the per-cell scan.
    """

    name = "gomoku"
    feature_dim = 2
    win_len = 5

    def __init__(self, size: int = 7):
        self.rows = size
        self.cols = size
        self.action_dim = size * size
        self.max_moves = size * size
        self.name = f"gomoku{size}"
        super().__init__()

    def place_cell(self, board: jax.Array, action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return action // self.cols, action % self.cols

    def valid_mask_board(self, board: jax.Array, move_count: jax.Array) -> jax.Array:
        occ = (board[0] + board[1]).astype(jnp.float32)
        near = jax.lax.reduce_window(
            occ, jnp.float32(0), jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        empty = occ == 0
        mask = (near > 0) & empty
        # Empty board: only the center (gomoku.py:104-105).
        center = jnp.zeros_like(mask).at[self.rows // 2, self.cols // 2].set(True)
        mask = jnp.where((occ.sum() == 0), center, mask)
        return mask.reshape(-1)

    def symmetries(self) -> Tuple[np.ndarray, np.ndarray]:
        perms = dihedral_perms(self.rows, self.cols)
        return perms, perms

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

    def path_cells(self, root_board: jax.Array, actions: jax.Array,
                   mask: jax.Array) -> jax.Array:
        """Gravity along a path without replay: the drop row of move d is
        the root column height plus the number of EARLIER path moves in the
        same column — a pairwise comparison, not a scan."""
        B, D = actions.shape
        heights = (root_board[:, 0] + root_board[:, 1]).sum(axis=1)  # (B, C)
        col_oh = jax.nn.one_hot(jnp.where(mask, actions, self.cols),
                                self.cols, dtype=jnp.bfloat16)       # (B,D,C)
        base = jnp.einsum("bdc,bc->bd", col_oh,
                          heights.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)        # (B, D)
        same_col = jnp.einsum("bdc,bec->bde", col_oh, col_oh,
                              preferred_element_type=jnp.float32)    # (B,D,D)
        earlier = (jnp.arange(D)[None, :, None]
                   > jnp.arange(D)[None, None, :]).astype(jnp.float32)
        prior_cnt = jnp.einsum("bde,bde->bd", same_col, earlier)
        row = self.rows - 1 - (base + prior_cnt).astype(jnp.int32)
        return row * self.cols + actions

    def symmetries(self) -> Tuple[np.ndarray, np.ndarray]:
        """Identity + left-right flip only: gravity breaks rotations
        (the reference's dihedral-8 is invalid here, SURVEY.md §2.4-2)."""
        idx = np.arange(self.rows * self.cols).reshape(self.rows, self.cols)
        cell_perms = np.stack([idx.reshape(-1), np.fliplr(idx).reshape(-1)])
        cols = np.arange(self.cols)
        action_perms = np.stack([cols, cols[::-1]])
        return cell_perms, action_perms

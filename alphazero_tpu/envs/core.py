"""Pure-functional vectorized game environments.

Replaces the reference's mutable-board ``Game`` classes (games/game.py:4-38,
make_move/undo_move discipline at ai/node.py:62-74) with immutable array
states and pure ``step``/``valid_mask`` functions that vmap over a game-batch
axis and compile under ``jax.jit``.

Design notes (TPU-first):
  * Board is two int8 stone planes ``(2, R, C)`` — plane p holds player p's
    stones.  The reference's to-move plane (tictactoe.py:41, connect4.py:62)
    is derived on demand in :meth:`Env.observation`, never stored.
  * Win detection is a single matmul against a precomputed 0/1 line-membership
    matrix (``board_flat @ W == win_len``) instead of the reference's per-move
    BFS ray walk (gomoku.py:66-91).  The matmul runs on the MXU and batches
    trivially over thousands of boards.
  * ``step`` is terminal-aware: stepping a finished game is a no-op, so
    lockstep batched self-play needs no divergent control flow.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EnvState:
    """Immutable game state (one game; vmap for a batch).

    Attributes:
      board: ``(2, R, C)`` int8 — stone planes, plane p = player p's stones.
      current_player: ``()`` int32 — player to move (0 or 1).
      move_count: ``()`` int32 — moves played so far.
      winner: ``()`` int32 — -1 none, else 0/1 (matches reference's
        ``check_winner`` return convention, games/game.py:36-38).
      done: ``()`` bool — game over (win or board full).
    """

    board: jax.Array
    current_player: jax.Array
    move_count: jax.Array
    winner: jax.Array
    done: jax.Array


def _make_line_matrix(rows: int, cols: int, win_len: int) -> np.ndarray:
    """Build the 0/1 cell→line membership matrix ``W (rows*cols, L)``.

    A player has won iff any column of ``flat_plane @ W`` equals ``win_len``.
    Lines enumerate every straight ``win_len``-run: horizontal, vertical and
    both diagonals (the four directions of the reference's ray walk,
    tictactoe.py:80, connect4.py:100, gomoku.py:92).
    """
    lines = []
    for r in range(rows):
        for c in range(cols):
            # (dr, dc): right, down, down-right, down-left
            for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
                er, ec = r + dr * (win_len - 1), c + dc * (win_len - 1)
                if 0 <= er < rows and 0 <= ec < cols:
                    lines.append(
                        [(r + dr * k) * cols + (c + dc * k) for k in range(win_len)]
                    )
    W = np.zeros((rows * cols, len(lines)), dtype=np.float32)
    for j, line in enumerate(lines):
        W[line, j] = 1.0
    return W


class Env:
    """Base class for vectorized two-player board games.

    Subclasses set the static geometry and implement ``_place`` (action →
    board cell) and ``valid_mask``.  All methods are pure and jit/vmap-safe;
    an ``Env`` instance is a Python-level constant closed over by jitted
    functions (never traced).

    Static attributes (mirroring the reference class attrs, e.g. gomoku.py:10-13):
      rows, cols:   board geometry
      action_dim:   number of discrete actions (cells, or columns for connect4)
      max_moves:    board capacity == reference ``state_dim``
      feature_dim:  NN input channels (3 with to-move plane, 2 canonical-only)
      win_len:      stones in a row to win
    """

    name: str
    rows: int
    cols: int
    action_dim: int
    max_moves: int
    feature_dim: int
    win_len: int

    def __init__(self):
        self._W = jnp.asarray(_make_line_matrix(self.rows, self.cols, self.win_len))

    # ---------------------------------------------------------------- helpers
    def _won(self, plane: jax.Array) -> jax.Array:
        """True iff ``plane`` (int8 ``(R, C)``) contains a completed line."""
        occ = plane.reshape(-1).astype(jnp.float32)
        return jnp.any(occ @ self._W >= self.win_len)

    # ----------------------------------------------------------------- API
    def init(self) -> EnvState:
        return EnvState(
            board=jnp.zeros((2, self.rows, self.cols), dtype=jnp.int8),
            current_player=jnp.int32(0),
            move_count=jnp.int32(0),
            winner=jnp.int32(-1),
            done=jnp.bool_(False),
        )

    def place_cell(self, board: jax.Array, action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Return (row, col) cell where ``action`` lands on ``board`` (2, R, C).

        Overridden by games (gravity for connect4, identity elsewhere)."""
        raise NotImplementedError

    def apply_action(self, board: jax.Array, player: jax.Array, action: jax.Array) -> jax.Array:
        """Pure board transition: place ``player``'s stone at ``action``."""
        r, c = self.place_cell(board, action)
        return board.at[player, r, c].set(1)

    def valid_mask_board(self, board: jax.Array, move_count: jax.Array) -> jax.Array:
        """Bool ``(action_dim,)`` of legal actions on a raw board."""
        raise NotImplementedError

    def step(self, state: EnvState, action: jax.Array) -> EnvState:
        """Apply ``action`` for the current player; no-op when done."""
        p = state.current_player
        board = self.apply_action(state.board, p, action)
        won = self._won(board[p])
        move_count = state.move_count + 1
        winner = jnp.where(won, p, jnp.int32(-1))
        done = won | (move_count >= self.max_moves)
        new = EnvState(
            board=board,
            current_player=1 - p,
            move_count=move_count,
            winner=winner,
            done=done,
        )
        # Terminal-aware: finished games pass through unchanged.
        return jax.tree.map(
            lambda old, nv: jnp.where(state.done, old, nv), state, new
        )

    def valid_mask(self, state: EnvState) -> jax.Array:
        """Bool ``(action_dim,)`` of legal actions (all False when done)."""
        return jnp.where(
            state.done, False, self.valid_mask_board(state.board, state.move_count)
        )

    def observation(self, state: EnvState) -> jax.Array:
        """Canonical NN input ``(feature_dim, R, C)`` float32.

        Channels 0/1 are always (player-to-move stones, opponent stones) —
        the reference's ``get_canonical_board`` convention (gomoku.py:34-40),
        applied uniformly so every game is trainable (the reference's
        tictactoe/connect4 lack it and cannot train, SURVEY.md §2.4-1).
        Games with ``feature_dim == 3`` add the reference's to-move plane
        filled with ``current_player`` (the value plane 2 holds when it is
        this player's turn, tictactoe.py:41).
        """
        p = state.current_player
        mine = jnp.where(p == 0, state.board[0], state.board[1])
        theirs = jnp.where(p == 0, state.board[1], state.board[0])
        planes = [mine, theirs]
        if self.feature_dim == 3:
            planes.append(jnp.full((self.rows, self.cols), p, dtype=jnp.int8))
        return jnp.stack(planes).astype(jnp.float32)

    # Raw-board variants used inside MCTS where we carry (board, player)
    # pairs instead of full EnvState.
    def observation_from_board(self, board: jax.Array, player: jax.Array) -> jax.Array:
        mine = jnp.where(player == 0, board[0], board[1])
        theirs = jnp.where(player == 0, board[1], board[0])
        planes = [mine, theirs]
        if self.feature_dim == 3:
            planes.append(jnp.full((self.rows, self.cols), player, dtype=jnp.int8))
        return jnp.stack(planes).astype(jnp.float32)

    def path_cells(self, root_board: jax.Array, actions: jax.Array,
                   mask: jax.Array) -> jax.Array:
        """Flat board cell of each action along a move path.

        Args: batched ``root_board (B, 2, R, C)``, ``actions (B, D)``,
        ``mask (B, D)`` (True = move exists).  Default: actions ARE cells.
        Overridden by connect4 (gravity depends on path prefix).
        """
        return actions

    def apply_path(self, root_board: jax.Array, root_player: jax.Array,
                   actions: jax.Array, mask: jax.Array) -> jax.Array:
        """Board after playing ``actions`` (masked) from the root — fully
        vectorized (no scan): stone placement is a one-hot sum over path
        positions.  Players alternate starting from ``root_player``.

        This replaces per-node board storage in the tree: a search leaf's
        board is reconstructed from its path in O(D·R·C) fused work
        (SURVEY.md §7: "recomputed by replay along the path").
        """
        B, D = actions.shape
        RC = self.rows * self.cols
        cells = self.path_cells(root_board, actions, mask)
        # bf16 one-hots are exact (0/1) at half the materialized bandwidth
        cell_oh = jax.nn.one_hot(
            jnp.where(mask, cells, RC), RC, dtype=jnp.bfloat16
        )                                                     # (B, D, RC)
        parity = (root_player[:, None] + jnp.arange(D)[None, :]) % 2  # (B, D)
        player_oh = jax.nn.one_hot(parity, 2, dtype=jnp.bfloat16)     # (B,D,2)
        delta = jnp.einsum("bdp,bdc->bpc", player_oh, cell_oh,
                           preferred_element_type=jnp.float32)
        board = root_board.astype(jnp.float32).reshape(B, 2, RC) + delta
        return (board.reshape(B, 2, self.rows, self.cols) > 0.5).astype(jnp.int8)

    def won_batch(self, planes: jax.Array) -> jax.Array:
        """Batched win check: ``planes (..., R, C)`` → bool ``(...)``."""
        occ = planes.reshape(planes.shape[:-2] + (-1,)).astype(jnp.float32)
        return jnp.any(occ @ self._W >= self.win_len, axis=-1)

    # ------------------------------------------------------------ symmetries
    def symmetries(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(cell_perms (S, R*C), action_perms (S, A))``.

        Symmetry s maps a position to an equivalent one:
        ``new_flat_plane = flat_plane[cell_perms[s]]`` and
        ``new_policy = policy[action_perms[s]]``.  Per-game groups replace the
        reference's unconditional dihedral-8 (train.py:30-49), which is
        invalid for connect4 (SURVEY.md §2.4-2).
        """
        raise NotImplementedError

    # ------------------------------------------------------------- rendering
    def render(self, state: EnvState) -> str:
        """ASCII board in the reference's display style (connect4.py:17-26)."""
        board = np.asarray(state.board)
        out = ["  " + " ".join(str(c % 10) for c in range(self.cols))]
        for r in range(self.rows):
            row = [
                "O" if board[0, r, c] else ("X" if board[1, r, c] else ".")
                for c in range(self.cols)
            ]
            out.append(f"{r % 10} " + " ".join(row))
        return "\n".join(out)


def dihedral_perms(rows: int, cols: int) -> np.ndarray:
    """Cell permutations of the 8 dihedral symmetries of a square board.

    Ordered as the reference generates them (train.py:40-49):
    r0, r0·lr, r0·tb, r90, r90·lr, r90·tb, r180, r270 — which together form
    the full dihedral group of order 8.
    """
    assert rows == cols, "dihedral-8 requires a square board"
    idx = np.arange(rows * cols).reshape(rows, cols)
    perms = []
    for k in (0, 1, 2, 3):
        rot = np.rot90(idx, k=k)
        perms.append(rot.reshape(-1))
        if k in (0, 1):
            perms.append(np.fliplr(rot).reshape(-1))
            perms.append(np.flipud(rot).reshape(-1))
    # perms[s] maps NEW cell i ← OLD cell perms[s][i]:  new = old[perm]
    order = [0, 1, 2, 3, 4, 5, 6, 7]
    return np.stack([perms[i] for i in order])

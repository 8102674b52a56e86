"""Scalar numpy oracle of the reference game rules, implemented fresh.

Semantics follow the reference (games/tictactoe.py, connect4.py, gomoku.py)
but the implementation is independent: direction-counting win checks instead
of BFS, height counters for gravity, etc.  Used only by tests as the ground
truth for the vectorized JAX envs and the batched MCTS.

Boards are ``(2, R, C)`` int8 stone planes (plane p = player p's stones) and
are mutated in place, mirroring the reference's make/undo discipline.
Actions are canonical ints: flat cells for tictactoe/gomoku, columns for
connect4.  Valid actions are returned in ascending action order (the
canonicalized child order required for parity, SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

import numpy as np

DIRS = ((0, 1), (1, 0), (1, 1), (1, -1))


class OracleGame:
    rows: int
    cols: int
    action_dim: int
    max_moves: int
    win_len: int
    name: str

    def new_board(self) -> np.ndarray:
        return np.zeros((2, self.rows, self.cols), dtype=np.int8)

    def cell_of(self, board: np.ndarray, action: int) -> tuple:
        raise NotImplementedError

    def place(self, board: np.ndarray, player: int, action: int) -> tuple:
        r, c = self.cell_of(board, action)
        assert board[0, r, c] == 0 and board[1, r, c] == 0, "illegal move"
        board[player, r, c] = 1
        return r, c

    def unplace(self, board: np.ndarray, player: int, cell: tuple) -> None:
        r, c = cell
        board[player, r, c] = 0

    def check_win_at(self, board: np.ndarray, player: int, cell: tuple) -> bool:
        """Win iff a completed run passes through ``cell``."""
        r0, c0 = cell
        for dr, dc in DIRS:
            count = 1
            for sign in (1, -1):
                r, c = r0 + sign * dr, c0 + sign * dc
                while (
                    0 <= r < self.rows
                    and 0 <= c < self.cols
                    and board[player, r, c] == 1
                ):
                    count += 1
                    r += sign * dr
                    c += sign * dc
            if count >= self.win_len:
                return True
        return False

    def has_win(self, board: np.ndarray, player: int) -> bool:
        occ = board[player]
        for r in range(self.rows):
            for c in range(self.cols):
                if occ[r, c] and self.check_win_at(board, player, (r, c)):
                    return True
        return False

    def valid_actions(self, board: np.ndarray, move_count: int) -> list:
        raise NotImplementedError


class OracleTicTacToe(OracleGame):
    name = "tictactoe"
    rows = cols = 3
    action_dim = max_moves = 9
    win_len = 3

    def cell_of(self, board, action):
        return action // 3, action % 3

    def valid_actions(self, board, move_count):
        empty = (board[0] + board[1]) == 0
        return [a for a in range(9) if empty[a // 3, a % 3]]


class OracleConnect4(OracleGame):
    name = "connect4"
    rows, cols = 6, 7
    action_dim = 7
    max_moves = 42
    win_len = 4

    def cell_of(self, board, action):
        height = int((board[0] + board[1])[:, action].sum())
        assert height < self.rows, "column full"
        return self.rows - 1 - height, action

    def valid_actions(self, board, move_count):
        occ = board[0] + board[1]
        return [a for a in range(7) if occ[0, a] == 0]


class OracleGomoku(OracleGame):
    win_len = 5

    def __init__(self, size: int = 7):
        self.rows = self.cols = size
        self.action_dim = self.max_moves = size * size
        self.name = f"gomoku{size}"

    def cell_of(self, board, action):
        return action // self.cols, action % self.cols

    def valid_actions(self, board, move_count):
        occ = board[0] + board[1]
        if occ.sum() == 0:
            return [(self.rows // 2) * self.cols + self.cols // 2]
        out = []
        for r in range(self.rows):
            for c in range(self.cols):
                if occ[r, c]:
                    continue
                r0, r1 = max(0, r - 1), min(self.rows, r + 2)
                c0, c1 = max(0, c - 1), min(self.cols, c + 2)
                if occ[r0:r1, c0:c1].any():
                    out.append(r * self.cols + c)
        return out


def make_oracle(name: str) -> OracleGame:
    if name == "tictactoe":
        return OracleTicTacToe()
    if name == "connect4":
        return OracleConnect4()
    if name.startswith("gomoku"):
        size = int(name[len("gomoku"):]) if len(name) > len("gomoku") else 7
        return OracleGomoku(size)
    raise ValueError(name)

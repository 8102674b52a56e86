"""Game environments (reference: games/__init__.py)."""

from alphazero_tpu.envs.core import Env, EnvState, dihedral_perms
from alphazero_tpu.envs.tictactoe import TicTacToe
from alphazero_tpu.envs.connect4 import Connect4
from alphazero_tpu.envs.gomoku import Gomoku


def make_env(name: str) -> Env:
    """Build an env by name: 'tictactoe', 'connect4', 'gomoku{N}' or 'gomoku'."""
    if name == "tictactoe":
        return TicTacToe()
    if name == "connect4":
        return Connect4()
    if name.startswith("gomoku"):
        size = int(name[len("gomoku"):]) if len(name) > len("gomoku") else 7
        return Gomoku(size)
    raise ValueError(f"unknown env: {name!r}")


__all__ = [
    "Env",
    "EnvState",
    "TicTacToe",
    "Connect4",
    "Gomoku",
    "make_env",
    "dihedral_perms",
]

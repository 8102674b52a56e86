"""Replay buffer + augmentation (reference: replay_buffer.py, train.py:8-50)."""

from alphazero_tpu.data.replay import (ReplayBuffer, add_games, create,
                                       create_sharded, num_rows,
                                       num_rows_augmented, sample,
                                       to_sharded)
from alphazero_tpu.data.augment import Symmetries

__all__ = ["ReplayBuffer", "create", "create_sharded", "to_sharded",
           "add_games", "sample", "num_rows", "num_rows_augmented",
           "Symmetries"]

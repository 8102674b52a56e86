"""Replay buffer + augmentation (reference: replay_buffer.py, train.py:8-50)."""

from alphazero_tpu.data.replay import ReplayBuffer, create, add_batch, sample
from alphazero_tpu.data.augment import Symmetries

__all__ = ["ReplayBuffer", "create", "add_batch", "sample", "Symmetries"]

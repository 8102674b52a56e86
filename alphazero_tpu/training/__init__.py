"""Training pipeline (reference: train.py, main.py:16-83)."""

from alphazero_tpu.training.selfplay import (
    SelfPlayState, init_selfplay, selfplay_step, make_selfplay_runner,
)
from alphazero_tpu.training.learner import (
    TrainMetrics, l2_penalty, loss_fn, make_optimizer, make_train_step,
    make_train_epoch,
)
from alphazero_tpu.training.loop import Trainer

__all__ = [
    "SelfPlayState", "init_selfplay", "selfplay_step", "make_selfplay_runner",
    "TrainMetrics", "l2_penalty", "loss_fn", "make_optimizer",
    "make_train_step", "make_train_epoch", "Trainer",
]

"""Evaluation / arena / human play (reference: test.py)."""

from alphazero_tpu.eval.arena import Agent, compare, make_play_games

__all__ = ["Agent", "compare", "make_play_games"]

"""Batched array MCTS (reference: ai/mcts.py, ai/node.py)."""

from alphazero_tpu.search.tree import Tree, init_tree, root_visit_counts, root_q
from alphazero_tpu.search.mcts import run_mcts, SearchResult
from alphazero_tpu.search.rollout import rollout_values

__all__ = [
    "Tree",
    "init_tree",
    "root_visit_counts",
    "root_q",
    "run_mcts",
    "SearchResult",
    "rollout_values",
]

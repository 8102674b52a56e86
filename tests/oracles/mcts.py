"""Scalar object-graph MCTS oracle reproducing the reference's semantics.

A fresh float64 numpy implementation of the reference search
(ai/mcts.py:11-60, ai/node.py:21-93, utils.py:29-55) used as ground truth for
the batched array MCTS: same PUCT/UCB1 formulas (including the ``n+1``
denominators and missing c_puct), same terminal backup conventions, same
first-max tie-breaking — with children enumerated in canonical ascending
action order (the batched search's implicit order; the reference's gomoku
set-iteration order is nondeterministic, SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

import math

import numpy as np


class ONode:
    __slots__ = ("parent", "action", "player", "move_count", "prior",
                 "visit", "value", "children")

    def __init__(self, parent, action, player, move_count, prior=0.0):
        self.parent = parent
        self.action = action
        self.player = player          # player to move at this node
        self.move_count = move_count
        self.prior = prior
        self.visit = 0
        self.value = 0.0
        self.children = []


def _select(node: ONode, network: bool) -> ONode:
    best, best_ucb = None, -math.inf
    for child in node.children:
        if network:
            explore = child.prior * math.sqrt(node.visit) / (child.visit + 1)
        else:
            explore = math.sqrt(
                2.0 * math.log(max(node.visit, 1)) / (child.visit + 1)
            )
        q = child.value / child.visit if child.visit > 0 else 0.0
        ucb = q + explore
        if ucb > best_ucb:  # strict: first max wins ties
            best, best_ucb = child, ucb
    return best


def canonical_obs(game, board: np.ndarray, player: int,
                  feature_dim: int) -> np.ndarray:
    mine, theirs = (board[0], board[1]) if player == 0 else (board[1], board[0])
    planes = [mine, theirs]
    if feature_dim == 3:
        planes.append(np.full_like(board[0], player))
    return np.stack(planes).astype(np.float64)


def oracle_mcts(game, board: np.ndarray, player: int, move_count: int,
                num_simulations: int, eval_fn=None, feature_dim: int = 2):
    """Run the search; returns (visit_counts (A,), root_q).

    ``eval_fn(obs) -> (probs (A,), value)`` — deterministic stub evaluator
    shared with the batched search under test.  ``None`` is not supported
    here (random rollouts cannot be trajectory-matched across frameworks).
    """
    root = ONode(None, None, player, move_count)
    for _ in range(num_simulations):
        node, trace, cells = root, [root], [None]
        # descent — mutates board, mover of node.action is 1 - node.player
        while node.children:
            node = _select(node, network=True)
            trace.append(node)
            cells.append(game.place(board, 1 - node.player, node.action))

        value = None
        if node.parent is not None:
            if game.check_win_at(board, 1 - node.player, cells[-1]):
                value = 1.0
            elif node.move_count == game.max_moves:
                value = 0.0

        if value is None:
            probs, nn_value = eval_fn(
                canonical_obs(game, board, node.player, feature_dim)
            )
            for a in game.valid_actions(board, node.move_count):
                node.children.append(
                    ONode(node, a, 1 - node.player, node.move_count + 1,
                          float(probs[a]))
                )
            value = -float(nn_value)

        # backup: negate per ply, undo board moves (ai/node.py:62-74)
        for n, cell in zip(reversed(trace), reversed(cells)):
            n.visit += 1
            n.value += value
            value = -value
            if n.parent is not None:
                game.unplace(board, 1 - n.player, cell)

    counts = np.zeros(game.action_dim, dtype=np.int64)
    for child in root.children:
        counts[child.action] = child.visit
    return counts, root.value / root.visit

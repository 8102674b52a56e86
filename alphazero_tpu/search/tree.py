"""Fixed-size batched search-tree arrays.

Replaces the reference's Python object graph (``Node`` with parent/children
pointers, ai/node.py:21-40) with struct-of-arrays storage over a
``(batch, num_nodes)`` grid so that thousands of independent trees advance in
lockstep under ``jit``.

Layout decisions (TPU-first, SURVEY.md §7):
  * One node slot per simulation (slot ``i+1`` belongs to simulation ``i``;
    slot 0 is the root; the last slot is a write-off "trash" row used to
    redirect masked scatters).  A simulation whose leaf is a terminal revisit
    simply leaves its slot unreachable — memory for control-flow simplicity.
  * Edge statistics live on the child node (visit/value_sum), exactly like
    the reference where ``child.value``/``child.visit`` are the edge stats
    (ai/node.py:27-28).
  * Boards are stored per node (int8 stone planes) so descent never replays
    move sequences; an allocation is one functional board update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Tree:
    """Batched search trees: leading axis B (games), second axis N (nodes).

    ``children[b, n, a] == -1`` means edge (n, a) has never been descended
    — equivalent to the reference's freshly-expanded child with visit 0
    (identical selection statistics, SURVEY.md §7 design stance).
    """

    visit: jax.Array          # (B, N) int32
    value_sum: jax.Array      # (B, N) float   — ref node.value (ai/node.py:28)
    prior: jax.Array          # (B, N, A) float — action priors set at expansion
    valid: jax.Array          # (B, N, A) bool  — legal actions at the node
    children: jax.Array       # (B, N, A) int32 — child slot or -1
    parent: jax.Array         # (B, N) int32    — parent slot or -1 (root)
    action_in: jax.Array      # (B, N) int32    — action that led here
    player: jax.Array         # (B, N) int32    — player to move at the node
    board: jax.Array          # (B, N, 2, R, C) int8
    move_count: jax.Array     # (B, N) int32
    expanded: jax.Array       # (B, N) bool
    terminal: jax.Array       # (B, N) bool
    terminal_value: jax.Array # (B, N) float — backup value for terminal leaves
                              #   (+1 win for the mover, 0 draw; ai/mcts.py:25-31)

    @property
    def num_nodes(self) -> int:
        return self.visit.shape[1]

    @property
    def batch_size(self) -> int:
        return self.visit.shape[0]

    @property
    def trash_row(self) -> int:
        return self.num_nodes - 1


def init_tree(env, boards, players, move_counts, dones, num_simulations,
              value_dtype=jnp.float32) -> Tree:
    """Build fresh trees rooted at the given batched positions.

    N = num_simulations + 2: root + one slot per simulation + trash row.
    A done game's root is marked terminal so lockstep search is a no-op for it.
    """
    B = boards.shape[0]
    N = num_simulations + 2
    A = env.action_dim
    root_valid = jax.vmap(env.valid_mask_board)(boards, move_counts)
    return Tree(
        visit=jnp.zeros((B, N), jnp.int32),
        value_sum=jnp.zeros((B, N), value_dtype),
        prior=jnp.zeros((B, N, A), value_dtype),
        valid=jnp.zeros((B, N, A), jnp.bool_).at[:, 0].set(root_valid),
        children=jnp.full((B, N, A), -1, jnp.int32),
        parent=jnp.full((B, N), -1, jnp.int32),
        action_in=jnp.full((B, N), -1, jnp.int32),
        player=jnp.zeros((B, N), jnp.int32).at[:, 0].set(players),
        board=jnp.zeros((B, N) + boards.shape[1:], jnp.int8).at[:, 0].set(boards),
        move_count=jnp.zeros((B, N), jnp.int32).at[:, 0].set(move_counts),
        expanded=jnp.zeros((B, N), jnp.bool_),
        terminal=jnp.zeros((B, N), jnp.bool_).at[:, 0].set(dones),
        terminal_value=jnp.zeros((B, N), value_dtype),
    )


def root_visit_counts(tree: Tree) -> jax.Array:
    """Visit counts of the root's children per action, ``(B, A)`` int32
    (the reference's visit→policy distribution, utils.py:46-55)."""
    B = tree.batch_size
    child = tree.children[:, 0, :]                      # (B, A)
    safe = jnp.maximum(child, 0)
    counts = jnp.take_along_axis(tree.visit, safe, axis=1)
    return jnp.where(child >= 0, counts, 0)


def root_q(tree: Tree) -> jax.Array:
    """Root mean value ``(B,)`` — the reference's ``root.value / root.visit``
    collected as ``qs`` during self-play (gomoku.py:141)."""
    return tree.value_sum[:, 0] / jnp.maximum(tree.visit[:, 0], 1).astype(
        tree.value_sum.dtype
    )

"""Fixed-size batched search-tree arrays — MXU-native layout.

Replaces the reference's Python object graph (``Node`` with parent/children
pointers, ai/node.py:21-40) with struct-of-arrays storage over a
``(batch, num_nodes)`` grid so that thousands of independent trees advance in
lockstep under ``jit``.

Layout decisions (TPU-first; driven by measurement — see ops/gather.py):
  * One node slot per simulation (slot ``i`` belongs to simulation ``i``;
    slot 0 is the root).  A simulation whose leaf is a terminal revisit
    leaves its slot unused — memory traded for static control flow.
  * All per-game dynamic indexing is one-hot einsum on the MXU; per-node
    stats pack into one ``(B, N, 3)`` array ``[visit, value_sum, expanded]``
    so descent reads child visit/Q/expandedness in a single contraction.
  * Edge statistics live on the child node, exactly like the reference
    where ``child.value``/``child.visit`` are the edge stats (ai/node.py:27-28).
  * NO per-node boards: a leaf's board is reconstructed from its path by
    ``env.apply_path`` (one fused one-hot sum), and backup is ONE einsum
    over the recorded path instead of a parent-pointer walk.
  * ``prior`` holds action priors with ``-inf`` at invalid actions — the
    legality mask and the PUCT numerator in one array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

VISIT, VALUE, EXPANDED = 0, 1, 2  # stats channels


def neg_inf(dtype) -> float:
    """Large finite negative standing in for -inf in prior arrays.

    True -inf breaks one-hot matmul gathers (0 * -inf = NaN on the MXU);
    any penalty dominating |Q| + the largest explore term is equivalent for
    the argmax.  Kept within dtype range so it stays finite when scaled.
    """
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        return -1e34
    if jnp.dtype(dtype) == jnp.dtype(jnp.float16):
        return -3e4
    return -1e30


@struct.dataclass
class Tree:
    """Batched search trees: leading axis B (games), second axis N (nodes).

    ``children[b, n, a] == -1`` means edge (n, a) has never been descended
    — equivalent to the reference's freshly-expanded child with visit 0
    (identical selection statistics, SURVEY.md §7 design stance).
    """

    stats: jax.Array       # (B, N, 3) float — [visit, value_sum, expanded]
    prior: jax.Array       # (B, N, A) float — priors, -inf at invalid actions
    children: jax.Array    # (B, N, A) float — child slot index or -1
    root_board: jax.Array  # (B, 2, R, C) int8
    root_player: jax.Array # (B,) int32
    root_move_count: jax.Array  # (B,) int32

    @property
    def num_nodes(self) -> int:
        return self.stats.shape[1]

    @property
    def batch_size(self) -> int:
        return self.stats.shape[0]


def edge_dtype_for(num_nodes: int, value_dtype) -> jnp.dtype:
    """Storage dtype for prior/children ("edge") arrays.

    Measured: bf16 here (exact for node indices ≤ 256) bought no speedup —
    per-kernel overhead dominates, not bandwidth — and bf16-rounded priors
    break exact equality with the Pallas engine.  Stay at the value dtype."""
    return jnp.dtype(value_dtype)


def init_tree(env, boards, players, move_counts, num_simulations,
              value_dtype=jnp.float32) -> Tree:
    """Fresh trees rooted at the given batched positions.

    N = num_simulations + 1 (root + one slot per loop simulation; the
    out-of-range fill index N maps to zero one-hot rows, so no trash row is
    needed).  The root is expanded separately before the simulation loop.
    """
    B = boards.shape[0]
    N = num_simulations + 1
    A = env.action_dim
    edt = edge_dtype_for(N, value_dtype)
    return Tree(
        stats=jnp.zeros((B, N, 3), value_dtype),
        prior=jnp.full((B, N, A), neg_inf(edt), edt),
        children=jnp.full((B, N, A), -1.0, edt),
        root_board=boards.astype(jnp.int8),
        root_player=players.astype(jnp.int32),
        root_move_count=move_counts.astype(jnp.int32),
    )


def root_visit_counts(tree: Tree) -> jax.Array:
    """Visit counts of the root's children per action, ``(B, A)`` int32
    (the reference's visit→policy distribution, utils.py:46-55)."""
    child = tree.children[:, 0, :].astype(jnp.int32)        # (B, A)
    oh = jax.nn.one_hot(child, tree.num_nodes, dtype=tree.stats.dtype)
    counts = jnp.einsum("ban,bn->ba", oh, tree.stats[:, :, VISIT],
                        preferred_element_type=tree.stats.dtype)
    return counts.astype(jnp.int32)


def root_q(tree: Tree) -> jax.Array:
    """Root mean value ``(B,)`` — the reference's ``root.value / root.visit``
    collected as ``qs`` during self-play (gomoku.py:141)."""
    return tree.stats[:, 0, VALUE] / jnp.maximum(tree.stats[:, 0, VISIT], 1.0)

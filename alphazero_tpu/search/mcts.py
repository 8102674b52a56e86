"""Batched neural-guided MCTS under ``jit``.

The AlphaZero search of the reference (ai/mcts.py:11-60) re-designed as
array programs: every simulation advances all B games' trees together —
descent is a read-only ``lax.while_loop`` over (node, action) registers,
leaf evaluation is ONE batched network forward for all games (subsuming the
reference's per-board eval cache, SURVEY.md §2.3), and expansion/backup are
masked single-row scatters.

Reference semantics reproduced exactly (see SURVEY.md §2.4):
  * PUCT 'reference' formula ``Q + prior·√N_parent/(n+1)`` with no c_puct
    (utils.py:36-40); UCB1 ``Q + √(2·ln N_parent/(n+1))`` for vanilla search.
  * Terminal backup convention: win at the descended node backs up +1 for
    the player who moved into it, draw 0, NN leaf backs up −value, and the
    value is negated each ply on the way up (ai/mcts.py:25-31,56;
    ai/node.py:62-74).
  * Root Dirichlet noise over the FULL action vector, no renormalization
    (utils.py:12-27).
  * Tie-breaks select the first maximum in canonical ascending-action order
    (the reference's child enumeration order; SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.search.tree import Tree, init_tree, root_visit_counts, root_q
from alphazero_tpu.search.rollout import rollout_values

# eval_fn: (obs (B, F, R, C)) -> (policy_probs (B, A), value (B,))
EvalFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


@struct.dataclass
class SearchResult:
    visit_counts: jax.Array  # (B, A) int32
    policy: jax.Array        # (B, A) float — normalized visit distribution
    root_q: jax.Array        # (B,) float
    tree: Tree


def _ucb_scores(tree: Tree, node: jax.Array, cfg: MCTSConfig,
                vanilla: bool) -> jax.Array:
    """UCB of every action at ``node`` per game, ``(B, A)``; invalid = -inf."""
    B = tree.batch_size
    brange = jnp.arange(B)
    child = tree.children[brange, node]                     # (B, A)
    safe = jnp.maximum(child, 0)
    cvisit = jnp.where(child >= 0,
                       jnp.take_along_axis(tree.visit, safe, axis=1), 0)
    cvalue = jnp.where(child >= 0,
                       jnp.take_along_axis(tree.value_sum, safe, axis=1), 0.0)
    fdt = tree.value_sum.dtype
    nvisit = cvisit.astype(fdt)
    q = jnp.where(cvisit > 0, cvalue / jnp.maximum(nvisit, 1.0), 0.0)
    pv = tree.visit[brange, node].astype(fdt)[:, None]      # (B, 1)
    if vanilla:
        # UCB1, reference 'normal' mode (utils.py:38,43): note the n+1
        # denominator quirk reproduced deliberately.
        explore = jnp.sqrt(2.0 * jnp.log(jnp.maximum(pv, 1.0)) / (nvisit + 1.0))
    else:
        prior = tree.prior[brange, node]                    # (B, A)
        explore = prior * jnp.sqrt(pv) / (nvisit + 1.0)
        if cfg.formula == "alphazero":
            explore = cfg.c_puct * explore
    ucb = q + explore
    valid = tree.valid[brange, node]
    return jnp.where(valid, ucb, -jnp.inf)


def _descend(tree: Tree, cfg: MCTSConfig, vanilla: bool):
    """Walk each tree from the root until an unexpanded frontier.

    Returns ``(parent, action, child)`` per game where ``child == -1`` means
    the edge has never been taken (allocate there) and ``child >= 0`` is an
    existing unexpanded (terminal) leaf to revisit.  A game whose root is
    unexpanded returns ``parent == -1`` (evaluate the root itself).
    The tree is read-only here, so the while_loop carries only registers.
    """
    B = tree.batch_size
    brange = jnp.arange(B)

    def cond(carry):
        _, _, _, stop = carry
        return ~jnp.all(stop)

    def body(carry):
        node, parent, action, stop = carry
        ucb = _ucb_scores(tree, node, cfg, vanilla)
        act = jnp.argmax(ucb, axis=-1).astype(jnp.int32)
        child = tree.children[brange, node, act]
        # Stop when the edge is unallocated, or the child is unexpanded
        # (fresh terminal leaf) — ref: `while node.children` (ai/mcts.py:19).
        safe_child = jnp.maximum(child, 0)
        child_expanded = (child >= 0) & tree.expanded[brange, safe_child]
        now_stop = ~child_expanded
        parent = jnp.where(stop, parent, node)
        action = jnp.where(stop, action, act)
        new_node = jnp.where(stop | now_stop, node, safe_child)
        # keep descending only games that found an expanded child
        return new_node, parent, action, stop | now_stop

    node0 = jnp.zeros((B,), jnp.int32)
    # Roots that are unexpanded (first simulation) or terminal stop at once.
    stop0 = ~tree.expanded[:, 0] | tree.terminal[:, 0]
    parent0 = jnp.full((B,), -1, jnp.int32)
    action0 = jnp.zeros((B,), jnp.int32)
    node, parent, action, _ = jax.lax.while_loop(
        cond, body, (node0, parent0, action0, stop0)
    )
    child = jnp.where(
        parent >= 0, tree.children[brange, jnp.maximum(parent, 0), action], 0
    )
    return parent, action, child


def _simulate_once(env, cfg: MCTSConfig, tree: Tree, slot: jax.Array,
                   rng: jax.Array, eval_fn: Optional[EvalFn],
                   use_dirichlet) -> Tree:
    """One batched simulation: descend → allocate → evaluate → expand → backup."""
    B = tree.batch_size
    A = env.action_dim
    brange = jnp.arange(B)
    trash = tree.trash_row
    fdt = tree.value_sum.dtype

    parent, action, child = _descend(tree, cfg, vanilla=eval_fn is None)

    root_case = parent < 0                      # unexpanded/terminal root
    alloc = (parent >= 0) & (child < 0)         # new edge → allocate slot
    revisit = (parent >= 0) & (child >= 0)      # existing terminal leaf

    # ---------------------------------------------------------- allocation
    # Write the new node's fields unconditionally into this simulation's
    # slot; games that do not allocate leave the slot unreachable.
    p_safe = jnp.maximum(parent, 0)
    pboard = tree.board[brange, p_safe]                       # (B, 2, R, C)
    pplayer = tree.player[brange, p_safe]
    nboard = jax.vmap(env.apply_action)(pboard, pplayer, action)
    nmove = tree.move_count[brange, p_safe] + 1
    mover_plane = jnp.take_along_axis(
        nboard, pplayer[:, None, None, None], axis=1
    )[:, 0]
    won = env.won_batch(mover_plane)
    nterm = won | (nmove >= env.max_moves)
    ntval = jnp.where(won, 1.0, 0.0).astype(fdt)
    nvalid = jax.vmap(env.valid_mask_board)(nboard, nmove)

    tree = tree.replace(
        parent=tree.parent.at[brange, slot].set(jnp.where(alloc, parent, -1)),
        action_in=tree.action_in.at[brange, slot].set(action),
        player=tree.player.at[brange, slot].set(1 - pplayer),
        board=tree.board.at[brange, slot].set(nboard),
        move_count=tree.move_count.at[brange, slot].set(nmove),
        valid=tree.valid.at[brange, slot].set(nvalid),
        terminal=tree.terminal.at[brange, slot].set(nterm),
        terminal_value=tree.terminal_value.at[brange, slot].set(ntval),
        expanded=tree.expanded.at[brange, slot].set(False),
        visit=tree.visit.at[brange, slot].set(0),
        value_sum=tree.value_sum.at[brange, slot].set(0.0),
    )
    # Point the parent's edge at the slot — masked via trash-row redirect.
    edge_row = jnp.where(alloc, p_safe, trash)
    tree = tree.replace(
        children=tree.children.at[brange, edge_row, action].set(slot)
    )

    leaf = jnp.where(root_case, 0, jnp.where(alloc, slot, child)).astype(jnp.int32)
    leaf_terminal = tree.terminal[brange, leaf]

    # ---------------------------------------------------------- evaluation
    leaf_board = tree.board[brange, leaf]
    leaf_player = tree.player[brange, leaf]
    if eval_fn is not None:
        obs = jax.vmap(env.observation_from_board)(leaf_board, leaf_player)
        probs, value = eval_fn(obs)
        probs = probs.astype(fdt)
        value = value.astype(fdt)
        # Root Dirichlet noise over the full action vector (utils.py:12-27),
        # applied at root expansion like the reference root-eval path
        # (ai/mcts.py:42-43,51-53).
        noise = jax.random.dirichlet(
            rng, jnp.full((A,), cfg.dirichlet_alpha, fdt), shape=(B,)
        ).astype(fdt)
        noisy = (1.0 - cfg.dirichlet_eps) * probs + cfg.dirichlet_eps * noise
        at_root = (leaf == 0) & use_dirichlet
        probs = jnp.where(at_root[:, None], noisy, probs)
        # NN leaf backs up -value (ai/mcts.py:56).
        eval_value = -value
    else:
        # Vanilla mode: uniform random rollout from the leaf, valued from
        # the perspective of the player who moved into it (ai/mcts.py:62-79);
        # children get zero priors (ai/node.py:58-59).
        probs = jnp.zeros((B, A), fdt)
        eval_value = rollout_values(
            env, leaf_board, leaf_player, tree.move_count[brange, leaf], rng
        ).astype(fdt)

    # ------------------------------------------------------------ expansion
    do_expand = ~leaf_terminal
    expand_row = jnp.where(do_expand, leaf, trash)
    tree = tree.replace(
        prior=tree.prior.at[brange, expand_row].set(probs),
        expanded=tree.expanded.at[brange, expand_row].set(True),
    )

    leaf_value = jnp.where(
        leaf_terminal, tree.terminal_value[brange, leaf], eval_value
    )

    # -------------------------------------------------------------- backup
    # Walk parents to the root adding the (per-ply negated) value
    # (ai/node.py:62-74).  Masked adds; finished games add zero.
    def bcond(carry):
        _, _, node, _ = carry
        return jnp.any(node >= 0)

    def bbody(carry):
        visit, value_sum, node, v = carry
        active = node >= 0
        row = jnp.maximum(node, 0)
        visit = visit.at[brange, row].add(jnp.where(active, 1, 0))
        value_sum = value_sum.at[brange, row].add(jnp.where(active, v, 0.0))
        node = jnp.where(active, tree.parent[brange, row], -1)
        return visit, value_sum, node, -v

    visit, value_sum, _, _ = jax.lax.while_loop(
        bcond, bbody, (tree.visit, tree.value_sum, leaf, leaf_value)
    )
    return tree.replace(visit=visit, value_sum=value_sum)


def run_mcts(env, eval_fn: Optional[EvalFn], boards, players, move_counts,
             dones, rng, cfg: MCTSConfig,
             use_dirichlet: Optional[jax.Array] = None,
             value_dtype=jnp.float32) -> SearchResult:
    """Run ``cfg.num_simulations`` batched simulations from the given roots.

    Args:
      env: an :class:`~alphazero_tpu.envs.Env` (Python constant).
      eval_fn: batched policy/value evaluator, or None for vanilla rollouts.
      boards/players/move_counts/dones: batched root positions.
      use_dirichlet: optional (B,) bool (defaults to cfg.use_dirichlet).

    Equivalent of the reference ``MCTS.mcts`` driver loop (ai/mcts.py:16-60)
    for B games at once; a fresh tree per call (the reference also rebuilds
    the root every move, gomoku.py:134).
    """
    B = boards.shape[0]
    if use_dirichlet is None:
        use_dirichlet = jnp.full((B,), cfg.use_dirichlet)
    tree = init_tree(env, boards, players, move_counts, dones,
                     cfg.num_simulations, value_dtype)

    def body(i, carry):
        tree, rng = carry
        rng, sub = jax.random.split(rng)
        tree = _simulate_once(env, cfg, tree, jnp.int32(i + 1), sub, eval_fn,
                              use_dirichlet)
        return tree, rng

    tree, _ = jax.lax.fori_loop(0, cfg.num_simulations, body, (tree, rng))
    counts = root_visit_counts(tree)
    total = jnp.maximum(counts.sum(axis=-1), 1).astype(tree.value_sum.dtype)
    policy = counts.astype(tree.value_sum.dtype) / total[:, None]
    return SearchResult(
        visit_counts=counts, policy=policy, root_q=root_q(tree), tree=tree
    )

"""Batched neural-guided MCTS under ``jit`` — one-hot/MXU formulation.

The AlphaZero search of the reference (ai/mcts.py:11-60) as array programs:
every simulation advances all B games' trees together.  Descent is a
``lax.while_loop`` over per-game registers with one-hot einsum row reads
(the tree is read-only during descent); leaf boards are reconstructed from
the recorded path (no per-node boards); leaf evaluation is ONE batched
network forward for all games (subsuming the reference's eval cache,
SURVEY.md §2.3); expansion writes target this simulation's slot at a scalar
index; and backup is a single path einsum instead of a pointer walk.

Reference semantics reproduced exactly (see SURVEY.md §2.4 and the parity
tests): PUCT ``Q + prior·√N_parent/(n+1)`` with no c_puct (utils.py:36-40),
UCB1 for vanilla search, terminal backup +1 for the mover / 0 draw / −value
for NN leaves with per-ply negation (ai/mcts.py:25-31,56; ai/node.py:62-74),
root Dirichlet over the full action vector with no renormalization
(utils.py:12-27), and first-max tie-breaking in ascending action order.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.ops.gather import pick, row_gather, rows_scatter_add
from alphazero_tpu.search.rollout import rollout_values
from alphazero_tpu.search.tree import (EXPANDED, VALUE, VISIT, Tree,
                                       init_tree, neg_inf, root_q,
                                       root_visit_counts)

# eval_fn: (obs (B, F, R, C)) -> (policy_probs (B, A), value (B,))
EvalFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


@struct.dataclass
class SearchResult:
    visit_counts: jax.Array  # (B, A) int32
    policy: jax.Array        # (B, A) float — normalized visit distribution
    root_q: jax.Array        # (B,) float
    tree: Tree


def _ucb(prior_row, cvisit, cvalue, pv, cfg: MCTSConfig, vanilla: bool):
    """UCB of each action from gathered child stats; -inf encodes invalid
    (prior_row is -inf there: multiplicative for PUCT, additive for UCB1)."""
    q = jnp.where(cvisit > 0, cvalue / jnp.maximum(cvisit, 1.0), 0.0)
    if vanilla:
        explore = jnp.sqrt(
            2.0 * jnp.log(jnp.maximum(pv, 1.0))[:, None] / (cvisit + 1.0)
        )
        return q + explore + prior_row          # prior_row ∈ {0, -inf}
    explore = prior_row * (jnp.sqrt(pv)[:, None] / (cvisit + 1.0))
    if cfg.formula == "alphazero":
        explore = cfg.c_puct * explore
    return q + explore


def _descend(tree: Tree, cfg: MCTSConfig, vanilla: bool, dcap: int):
    """Walk every tree root→frontier (see :func:`_descend_arrays`)."""
    return _descend_arrays(tree.stats, tree.prior, tree.children, cfg,
                           vanilla, dcap)


def _descend_arrays(stats, prior, children, cfg: MCTSConfig, vanilla: bool,
                    dcap: int):
    """Walk every tree root→frontier.  Returns per game:
    (path (B, Dcap) interior node ids with N-fill, apath (B, Dcap) actions,
    depth (B,), parent (B,), action (B,), child (B,) — child < 0 means the
    edge was never taken (allocate)).  ``parent < 0`` ⇔ the root itself is
    the leaf (only for unexpanded roots of finished games).

    Takes raw tree arrays so leaf-batched rounds can descend on
    virtual-loss-annotated copies (stats_v/children_v) of the live tree."""
    B, N = stats.shape[0], stats.shape[1]
    fdt = stats.dtype

    def cond(c):
        d, node, pv, stop, *_ = c
        return (d < dcap) & ~jnp.all(stop)

    def body(c):
        d, node, pv, stop, depth, parent, action, child, path, apath = c
        prior_row = row_gather(prior, node).astype(fdt)       # (B, A)
        child_row = row_gather(children, node)                # (B, A)
        cstats = jax.nn.one_hot(child_row.astype(jnp.int32), N, dtype=fdt)
        cstats = jnp.einsum("ban,bne->bae", cstats, stats,
                            preferred_element_type=fdt)       # (B, A, 3)
        cvisit, cvalue, cexp = cstats[..., VISIT], cstats[..., VALUE], \
            cstats[..., EXPANDED]
        ucb = _ucb(prior_row, cvisit, cvalue, pv, cfg, vanilla)
        act = jnp.argmax(ucb, axis=-1).astype(jnp.int32)
        c_sel = pick(child_row, act)
        now_stop = (c_sel < 0) | (pick(cexp, act) == 0)

        path = path.at[:, d].set(jnp.where(stop, N, node))
        apath = apath.at[:, d].set(jnp.where(stop, 0, act))
        parent = jnp.where(stop, parent, node)
        action = jnp.where(stop, action, act)
        child = jnp.where(stop, child, c_sel)
        depth = jnp.where(stop, depth, d + 1)
        node = jnp.where(stop | now_stop, node,
                         c_sel.astype(jnp.int32))
        pv = jnp.where(stop, pv, pick(cvisit, act))
        return (d + 1, node, pv, stop | now_stop, depth, parent, action,
                child, path, apath)

    node0 = jnp.zeros((B,), jnp.int32)
    pv0 = stats[:, 0, VISIT]
    stop0 = stats[:, 0, EXPANDED] == 0        # done-game roots stay leaves
    depth0 = jnp.zeros((B,), jnp.int32)
    parent0 = jnp.full((B,), -1, jnp.int32)
    action0 = jnp.zeros((B,), jnp.int32)
    child0 = jnp.zeros((B,), children.dtype)
    path0 = jnp.full((B, dcap), N, jnp.int32)
    apath0 = jnp.zeros((B, dcap), jnp.int32)
    _, _, _, _, depth, parent, action, child, path, apath = \
        jax.lax.while_loop(cond, body, (0, node0, pv0, stop0, depth0,
                                        parent0, action0, child0, path0,
                                        apath0))
    return path, apath, depth, parent, action, child


def _prep_priors(probs, valid, vanilla: bool, edt):
    """Expansion priors with finite -inf legality encoding (edge dtype)."""
    if vanilla:
        return jnp.where(valid, 0.0, neg_inf(edt)).astype(edt)
    return jnp.where(valid, probs, neg_inf(edt)).astype(edt)


def _simulate_once(env, cfg: MCTSConfig, tree: Tree, slot, rng,
                   eval_fn: Optional[EvalFn], dcap: int) -> Tree:
    """One batched simulation: descend → reconstruct leaf → evaluate →
    expand (into this sim's slot) → backup (one einsum)."""
    B, N = tree.batch_size, tree.num_nodes
    A = env.action_dim
    fdt = tree.stats.dtype
    vanilla = eval_fn is None

    path, apath, depth, parent, action, child = _descend(
        tree, cfg, vanilla, dcap
    )
    root_case = parent < 0
    alloc = (parent >= 0) & (child < 0)
    leaf = jnp.where(root_case, 0,
                     jnp.where(alloc, slot, child.astype(jnp.int32)))

    # ---- leaf board from the path (includes the new edge's action)
    move_mask = jnp.arange(dcap)[None, :] < depth[:, None]
    leaf_board = env.apply_path(tree.root_board, tree.root_player,
                                apath, move_mask)
    leaf_player = (tree.root_player + depth) % 2
    leaf_mc = tree.root_move_count + depth
    mover = 1 - leaf_player
    mover_plane = jnp.where((mover == 0)[:, None, None],
                            leaf_board[:, 0], leaf_board[:, 1])
    won = env.won_batch(mover_plane)
    # terminal: win for the mover → +1, full board → draw 0 (ai/mcts.py:25-31)
    leaf_terminal = (won | (leaf_mc >= env.max_moves)) & ~root_case
    # finished-game roots back up 0 and stay unexpanded
    leaf_terminal = leaf_terminal | (root_case & (tree.stats[:, 0, EXPANDED] == 0))
    tval = jnp.where(won, 1.0, 0.0).astype(fdt)

    # ---- evaluation (network) or rollout (vanilla)
    if not vanilla:
        obs = jax.vmap(env.observation_from_board)(leaf_board, leaf_player)
        probs, value = eval_fn(obs)
        eval_value = (-value).astype(fdt)     # ai/mcts.py:56
    else:
        probs = jnp.zeros((B, A), fdt)
        eval_value = rollout_values(env, leaf_board, leaf_player, leaf_mc,
                                    rng).astype(fdt)

    # ---- expansion into this simulation's slot (scalar index writes)
    edt = tree.prior.dtype
    do_expand = alloc & ~leaf_terminal
    valid_new = jax.vmap(env.valid_mask_board)(leaf_board, leaf_mc)
    prior_slot = jnp.where(do_expand[:, None],
                           _prep_priors(probs, valid_new, vanilla, edt),
                           neg_inf(edt)).astype(edt)
    tree = tree.replace(
        prior=jax.lax.dynamic_update_index_in_dim(
            tree.prior, prior_slot, slot, axis=1),
    )
    # parent's edge now points at the slot (full-array masked write — the
    # only per-game-row write left; see ops/gather.py rationale)
    edge_mask = (jax.nn.one_hot(jnp.where(alloc, parent, N), N, dtype=edt)
                 [:, :, None]
                 * jax.nn.one_hot(action, A, dtype=edt)[:, None, :])
    children = jnp.where(edge_mask > 0,
                         jnp.asarray(slot).astype(edt), tree.children)
    tree = tree.replace(children=children)

    # ---- backup: one einsum over the path (ai/node.py:62-74 semantics)
    leaf_value = jnp.where(leaf_terminal, tval, eval_value)
    pos = jnp.arange(dcap)[None, :]
    full_path = jnp.where(pos == depth[:, None], leaf[:, None], path)
    active = (pos <= depth[:, None]).astype(fdt)
    sign = jnp.where((depth[:, None] - pos) % 2 == 0, 1.0, -1.0).astype(fdt)
    vals = jnp.stack(
        [active,
         active * sign * leaf_value[:, None],
         active * 0.0 + jnp.where(pos == depth[:, None], do_expand[:, None],
                                  0.0).astype(fdt)],
        axis=-1,
    )  # [visit+1, ±value, expanded-flag set at the leaf slot]
    stats = rows_scatter_add(tree.stats, full_path, vals)
    return tree.replace(stats=stats)


def _simulate_round(env, cfg: MCTSConfig, tree: Tree, slot_base,
                    eval_fn: EvalFn, dcap: int) -> Tree:
    """One leaf-batched round of K simulations (``cfg.leaf_batch``).

    Production AlphaZero batches leaf evaluations: K virtual-loss descents
    pick K distinct frontier leaves, ONE network forward evaluates all K·B
    leaves, then all K expansions/backups apply at once.  This cuts
    sequential tree-update rounds per move by K and feeds the MXU forwards
    K× larger (measured 2.6× cheaper per position at K=8 for the connect4
    ResNet) — the standard throughput/diversity trade the reference cannot
    express with its one-leaf-at-a-time loop (ai/mcts.py:16-60).

    Semantics: identical to K sequential simulations EXCEPT selection of
    leaves 2..K sees virtual losses (visit+1, value−``cfg.virtual_loss``
    non-alternating along the path) instead of the true backups of this
    round's earlier leaves.  Descents that re-reach a pending leaf become
    revisits of the same position (evaluated twice, backed up twice), as a
    terminal revisit would be.  With ``leaf_batch=1`` this reduces exactly
    to the sequential engine (covered by tests/test_mcts_parity.py).

    ``slot_base`` (traced) is the node slot of this round's first leaf;
    ranks whose slot would exceed the simulation budget park on the spare
    slot N-1 with all their effects masked out (partial final round).
    """
    B, N = tree.batch_size, tree.num_nodes
    A = env.action_dim
    K = cfg.leaf_batch
    fdt = tree.stats.dtype
    edt = tree.prior.dtype
    S = cfg.num_simulations
    pos = jnp.arange(dcap)[None, :]

    stats_v = tree.stats
    children_v = tree.children
    per_k = []
    for k in range(K):
        slot_lin = slot_base + k
        active = slot_lin < S                       # () bool, traced
        slot = jnp.where(active, slot_lin, N - 1)   # spare slot when masked
        path, apath, depth, parent, action, child = _descend_arrays(
            stats_v, tree.prior, children_v, cfg, False, dcap)
        root_case = parent < 0
        alloc = (parent >= 0) & (child < 0)
        leaf = jnp.where(root_case, 0,
                         jnp.where(alloc, slot, child.astype(jnp.int32)))
        # pending child pointer — immediately, so later descents in this
        # round revisit the slot instead of double-allocating the edge
        edge_mask = (jax.nn.one_hot(
            jnp.where(alloc & active, parent, N), N, dtype=edt)[:, :, None]
            * jax.nn.one_hot(action, A, dtype=edt)[:, None, :])
        children_v = jnp.where(edge_mask > 0, slot.astype(edt), children_v)
        # virtual loss along path + pending leaf
        full_path = jnp.where(pos == depth[:, None], leaf[:, None], path)
        m = ((pos <= depth[:, None]) & active).astype(fdt)    # (B, dcap)
        vvals = jnp.stack([m, -cfg.virtual_loss * m, m * 0.0], axis=-1)
        stats_v = rows_scatter_add(stats_v, full_path, vvals)
        per_k.append((apath, depth, root_case, alloc, leaf, slot, active,
                      full_path))

    # ---- ONE forward for all K·B leaves
    apaths = jnp.stack([p[0] for p in per_k])                  # (K, B, dcap)
    depths = jnp.stack([p[1] for p in per_k])                  # (K, B)
    move_mask = (pos[None] < depths[..., None]).reshape(K * B, dcap)
    boards_kb = jnp.broadcast_to(
        tree.root_board[None], (K,) + tree.root_board.shape
    ).reshape((K * B,) + tree.root_board.shape[1:])
    players_kb = jnp.broadcast_to(tree.root_player[None], (K, B)).reshape(-1)
    mc_kb = jnp.broadcast_to(tree.root_move_count[None], (K, B)).reshape(-1)
    leaf_board = env.apply_path(boards_kb, players_kb,
                                apaths.reshape(K * B, dcap), move_mask)
    leaf_player = (players_kb + depths.reshape(-1)) % 2
    leaf_mc = mc_kb + depths.reshape(-1)
    mover = 1 - leaf_player
    mover_plane = jnp.where((mover == 0)[:, None, None],
                            leaf_board[:, 0], leaf_board[:, 1])
    won = env.won_batch(mover_plane).reshape(K, B)
    root_cases = jnp.stack([p[2] for p in per_k])              # (K, B)
    root_unexp = tree.stats[:, 0, EXPANDED] == 0
    leaf_terminal = ((won | (leaf_mc.reshape(K, B) >= env.max_moves))
                     & ~root_cases) | (root_cases & root_unexp[None])
    tval = jnp.where(won, 1.0, 0.0).astype(fdt)

    obs = jax.vmap(env.observation_from_board)(leaf_board, leaf_player)
    probs, value = eval_fn(obs)
    probs = probs.reshape(K, B, A)
    eval_value = (-value).reshape(K, B).astype(fdt)
    valid_new = jax.vmap(env.valid_mask_board)(leaf_board, leaf_mc) \
        .reshape(K, B, A)

    # ---- expansions: prior rows into each rank's slot
    allocs = jnp.stack([p[3] for p in per_k])                  # (K, B)
    actives = jnp.stack([jnp.broadcast_to(p[6], (B,)) for p in per_k])
    do_expand = allocs & ~leaf_terminal & actives
    prior = tree.prior
    for k in range(K):
        prior_slot = jnp.where(
            do_expand[k][:, None],
            _prep_priors(probs[k].astype(fdt), valid_new[k], False, edt),
            neg_inf(edt)).astype(edt)
        prior = jax.lax.dynamic_update_index_in_dim(
            prior, prior_slot, per_k[k][5], axis=1)

    # ---- all K backups in one scatter-add (shared prefixes sum correctly)
    leaves = jnp.stack([p[4] for p in per_k])                  # (K, B)
    leaf_value = jnp.where(leaf_terminal, tval, eval_value)    # (K, B)
    idx, vals = [], []
    for k in range(K):
        depth_k = depths[k]
        m = ((pos <= depth_k[:, None]) & actives[k][:, None]).astype(fdt)
        sign = jnp.where((depth_k[:, None] - pos) % 2 == 0, 1.0, -1.0) \
            .astype(fdt)
        idx.append(jnp.where(m > 0, per_k[k][7], N))
        vals.append(jnp.stack(
            [m,
             m * sign * leaf_value[k][:, None],
             jnp.where(pos == depth_k[:, None], do_expand[k][:, None],
                       False).astype(fdt)], axis=-1))
    stats = rows_scatter_add(tree.stats, jnp.concatenate(idx, axis=1),
                             jnp.concatenate(vals, axis=1))
    return tree.replace(stats=stats, prior=prior, children=children_v)


def run_mcts(env, eval_fn: Optional[EvalFn], boards, players, move_counts,
             dones, rng, cfg: MCTSConfig,
             use_dirichlet: Optional[jax.Array] = None,
             value_dtype=jnp.float32, backend: str = "auto") -> SearchResult:
    """Run ``cfg.num_simulations`` batched simulations from the given roots.

    Equivalent of the reference ``MCTS.mcts`` driver loop (ai/mcts.py:16-60)
    for B games at once; a fresh tree per call (the reference also rebuilds
    the root every move, gomoku.py:134).  Simulation 0 (root evaluation +
    expansion with optional Dirichlet noise) is hoisted out of the loop —
    a freshly-built root is always unexpanded on the first simulation.

    ``backend='auto'`` uses the Pallas TPU fast path (search/pallas_mcts.py,
    identical semantics, VMEM-resident tree) when it applies; 'xla' forces
    the portable engine; 'pallas' forces the kernel path.
    """
    B = boards.shape[0]
    if backend != "xla" and value_dtype == jnp.float32:
        spec = getattr(eval_fn, "dense_spec", None)
        if spec is not None and backend in ("auto", "fused"):
            from alphazero_tpu.search import pallas_fused
            if backend == "fused" or pallas_fused.supports_fused(
                    env, B, cfg, spec[0]):
                return pallas_fused.run_mcts_fused(
                    env, spec[0], spec[1], eval_fn, boards, players,
                    move_counts, dones, rng, cfg, use_dirichlet)
        from alphazero_tpu.search import pallas_mcts
        if backend == "pallas" or pallas_mcts.supports(
                env, B, cfg, eval_fn is None):
            return pallas_mcts.run_mcts_pallas(
                env, eval_fn, boards, players, move_counts, dones, rng,
                cfg, use_dirichlet)
    A = env.action_dim
    vanilla = eval_fn is None
    if use_dirichlet is None:
        use_dirichlet = jnp.full((B,), cfg.use_dirichlet)
    tree = init_tree(env, boards, players, move_counts,
                     cfg.num_simulations, value_dtype)
    fdt = tree.stats.dtype
    dcap = int(min(env.max_moves + 1, cfg.num_simulations + 1))

    # ---- simulation 0: evaluate + expand the root (ai/mcts.py:34-56)
    rng, root_rng, loop_rng = jax.random.split(rng, 3)
    root_valid = jax.vmap(env.valid_mask_board)(
        tree.root_board, tree.root_move_count
    )
    if not vanilla:
        obs = jax.vmap(env.observation_from_board)(
            tree.root_board, tree.root_player
        )
        probs, value = eval_fn(obs)
        probs = probs.astype(fdt)
        noise = jax.random.dirichlet(
            root_rng, jnp.full((A,), cfg.dirichlet_alpha, jnp.float32),
            shape=(B,), dtype=jnp.float32,
        ).astype(fdt)
        noisy = (1.0 - cfg.dirichlet_eps) * probs + cfg.dirichlet_eps * noise
        probs = jnp.where(use_dirichlet[:, None], noisy, probs)
        v0 = (-value).astype(fdt)
    else:
        probs = jnp.zeros((B, A), fdt)
        v0 = rollout_values(env, tree.root_board, tree.root_player,
                            tree.root_move_count, root_rng).astype(fdt)
    live = ~dones
    edt = tree.prior.dtype
    root_prior = jnp.where(live[:, None],
                           _prep_priors(probs, root_valid, vanilla, edt),
                           neg_inf(edt)).astype(edt)
    root_stats = jnp.stack(
        [jnp.ones((B,), fdt),
         jnp.where(live, v0, 0.0),
         live.astype(fdt)], axis=-1,
    )
    tree = tree.replace(
        prior=tree.prior.at[:, 0].set(root_prior),
        stats=tree.stats.at[:, 0].set(root_stats),
    )

    # ---- simulations 1..S-1
    if not vanilla and cfg.leaf_batch > 1:
        K = cfg.leaf_batch
        rounds = -(-(cfg.num_simulations - 1) // K)

        def rbody(r, tree):
            return _simulate_round(env, cfg, tree, 1 + r * K, eval_fn, dcap)

        tree = jax.lax.fori_loop(0, rounds, rbody, tree)
    else:
        def body(i, carry):
            tree, rng = carry
            if vanilla:
                rng, sub = jax.random.split(rng)
            else:
                sub = rng
            tree = _simulate_once(env, cfg, tree, i, sub, eval_fn, dcap)
            return tree, rng

        tree, _ = jax.lax.fori_loop(1, cfg.num_simulations, body,
                                    (tree, loop_rng))
    counts = root_visit_counts(tree)
    total = jnp.maximum(counts.sum(axis=-1), 1).astype(fdt)
    policy = counts.astype(fdt) / total[:, None]
    return SearchResult(
        visit_counts=counts, policy=policy, root_q=root_q(tree), tree=tree
    )

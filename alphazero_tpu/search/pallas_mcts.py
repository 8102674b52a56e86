"""Pallas TPU fast path for the per-simulation search machinery.

Motivation (measured): the XLA formulation spends ~220µs/simulation on
~40 small kernels (descent gathers, board reconstruction, terminal checks,
expansion writes, backup) — mostly fixed per-kernel overhead.  This module
consolidates everything except the network forward into TWO Pallas kernels
per simulation, with the whole tree VMEM-resident inside each call:

  descend_kernel: UCB descent (while_loop over tree levels), leaf board
    reconstruction by replaying the recorded path (sequential gravity for
    connect4 — trivial inside VMEM), terminal detection (win-line matmul),
    legal-move mask, and the canonical observation — all in one launch.
  update_kernel: expansion writes into this simulation's slot, the parent
    edge pointer, and the path backup loop — aliased in-place on the tree.

Layout: "games in lanes" — every per-game vector is ``(X, B)`` with the
game batch B in the TPU lane dimension (multiples of 128), so all search
logic vectorizes uniformly across games.  Tree arrays are ``stats (3,N,B)``
[visit, value, expanded], ``prior (A,N,B)``, ``children (A,N,B)``.

Scope: network-guided search (vanilla rollouts stay on the XLA path) for
games whose ``(A, N, B)`` arrays fit VMEM (connect4/tictactoe at benchmark
sizes; large-board gomoku uses the XLA path).  Semantics are IDENTICAL to
the XLA engine — same formulas, same exact one-hot arithmetic — verified
by equality tests in tests/test_pallas_mcts.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.envs.core import _make_line_matrix
from alphazero_tpu.search.tree import neg_inf

NEG = -1e30


def _iota(n, b):
    return jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)


def supports(env, batch: int, cfg: MCTSConfig, vanilla: bool) -> bool:
    """Whether the Pallas path applies: TPU, network mode, lane-aligned
    batch, and tree arrays small enough for VMEM."""
    if vanilla or batch % 128 != 0:
        return False
    N = cfg.num_simulations + 1
    if 3 * env.action_dim * N * batch * 4 > 9_000_000:
        return False
    if env.name.startswith("gomoku"):
        neighbor = True  # (RC, RC) dilation matrix must also fit
        if env.rows * env.cols > 128:
            return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _argmax_first(x, axis0_size, b):
    """First-maximum index along dim 0 of ``x (A, B)`` → (1, B) int32
    (ascending-action tie-break, matching the reference's first-max)."""
    m = jnp.max(x, axis=0, keepdims=True)
    ids = _iota(axis0_size, b)
    cand = jnp.where(x >= m, ids, axis0_size)
    return jnp.min(cand, axis=0, keepdims=True)


def _game_tables(env):
    """Constant matrices the kernels need, in (RC, ·) layouts."""
    RC = env.rows * env.cols
    W = _make_line_matrix(env.rows, env.cols, env.win_len)       # (RC, L)
    tables = {"W": W.astype(np.float32)}
    if env.name == "connect4":
        colmat = np.zeros((env.cols, RC), np.float32)            # (C, RC)
        for c in range(env.cols):
            for r in range(env.rows):
                colmat[c, r * env.cols + c] = 1.0
        tables["colmat"] = colmat
    if env.name.startswith("gomoku"):
        D = np.zeros((RC, RC), np.float32)
        for r in range(env.rows):
            for c in range(env.cols):
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < env.rows and 0 <= cc < env.cols:
                            D[r * env.cols + c, rr * env.cols + cc] = 1.0
        tables["neigh"] = D
    return tables


# --------------------------------------------------------------------------
# descend kernel
# --------------------------------------------------------------------------

def _descend_kernel(env, cfg: MCTSConfig, dcap: int,
                    # refs:
                    stats_ref, prior_ref, children_ref, board_ref,
                    player_ref, mc_ref, W_ref, aux_ref,
                    path_ref, apath_ref, meta_ref, obs_ref, valid_ref,
                    flags_ref):
    """See module docstring.  Outputs:
      path (dcap, B) int32, apath (dcap, B) int32,
      meta (8, B) f32: [depth, parent, action, alloc, leaf, terminal, tval,
                        leaf_player],
      obs (F*RC, B) f32 canonical observation of the leaf,
      valid (A, B) f32 legal-move mask at the leaf,
      flags unused padding.
    """
    A = env.action_dim
    RC = env.rows * env.cols
    R, C = env.rows, env.cols
    stats = stats_ref[:]          # (3, N, B)
    prior = prior_ref[:]          # (A, N, B)
    children = children_ref[:]    # (A, N, B)
    N = stats.shape[1]
    B = stats.shape[2]
    rootp = player_ref[:]         # (1, B) int32
    rootmc = mc_ref[:]            # (1, B) int32

    # ---------------- descent
    node0 = jnp.zeros((1, B), jnp.int32)
    pv0 = stats[0, 0:1, :]
    # int32 stop flags: Mosaic cannot legalize bool-vector while carries
    stop0 = (stats[2, 0:1, :] == 0).astype(jnp.int32)
    depth0 = jnp.zeros((1, B), jnp.int32)
    parent0 = jnp.full((1, B), -1, jnp.int32)
    action0 = jnp.zeros((1, B), jnp.int32)
    chsel0 = jnp.zeros((1, B), jnp.float32)

    def cond(c):
        d, node, pv, stop, depth, parent, action, chsel = c
        return (d < dcap) & (jnp.min(stop) < 1)

    def body(c):
        d, node, pv, stop, depth, parent, action, chsel = c
        oh = (_iota(N, B) == node).astype(jnp.float32)        # (N, B)
        prow = jnp.sum(prior * oh[None], axis=1)              # (A, B)
        crow = jnp.sum(children * oh[None], axis=1)           # (A, B)
        oh2 = (_iota(N, B)[None] == crow[:, None, :].astype(jnp.int32)
               ).astype(jnp.float32)                          # (A, N, B)
        cvisit = jnp.sum(stats[0][None] * oh2, axis=1)        # (A, B)
        cvalue = jnp.sum(stats[1][None] * oh2, axis=1)
        cexp = jnp.sum(stats[2][None] * oh2, axis=1)
        q = jnp.where(cvisit > 0, cvalue / jnp.maximum(cvisit, 1.0), 0.0)
        explore = prow * (jnp.sqrt(pv) / (cvisit + 1.0))
        if cfg.formula == "alphazero":
            explore = cfg.c_puct * explore
        ucb = q + explore
        act = _argmax_first(ucb, A, B)                        # (1, B)
        act_oh = (_iota(A, B) == act).astype(jnp.float32)
        c_sel = jnp.sum(crow * act_oh, axis=0, keepdims=True)
        v_sel = jnp.sum(cvisit * act_oh, axis=0, keepdims=True)
        e_sel = jnp.sum(cexp * act_oh, axis=0, keepdims=True)
        now_stop = ((c_sel < 0) | (e_sel == 0)).astype(jnp.int32)

        frozen = stop > 0
        path_ref[pl.ds(d, 1), :] = jnp.where(frozen, N, node)
        apath_ref[pl.ds(d, 1), :] = jnp.where(frozen, 0, act)
        parent = jnp.where(frozen, parent, node)
        action = jnp.where(frozen, action, act)
        chsel = jnp.where(frozen, chsel, c_sel)
        depth = jnp.where(frozen, depth, d + 1)
        node = jnp.where(frozen | (now_stop > 0), node,
                         c_sel.astype(jnp.int32))
        pv = jnp.where(frozen, pv, v_sel)
        return (d + 1, node, pv, jnp.maximum(stop, now_stop), depth,
                parent, action, chsel)

    # init the full path to the N-fill so untouched levels are inert
    path_ref[:] = jnp.full((dcap, B), N, jnp.int32)
    apath_ref[:] = jnp.zeros((dcap, B), jnp.int32)
    (_, _, _, _, depth, parent, action, chsel) = jax.lax.while_loop(
        cond, body,
        (0, node0, pv0, stop0, depth0, parent0, action0, chsel0))

    root_case = (parent < 0).astype(jnp.float32)
    alloc = ((parent >= 0) & (chsel < 0)).astype(jnp.float32)

    # ---------------- leaf board reconstruction (replay the path)
    p0 = board_ref[0, :, :].astype(jnp.float32)               # (RC, B)
    p1 = board_ref[1, :, :].astype(jnp.float32)
    if env.name == "connect4":
        colmat = aux_ref[:]                                   # (C, RC)
        heights0 = jnp.dot(colmat, p0 + p1,
                           preferred_element_type=jnp.float32)  # (C, B)
    else:
        heights0 = jnp.zeros((1, B), jnp.float32)

    def recon(d, carry):
        p0, p1, heights = carry
        a = apath_ref[pl.ds(d, 1), :]                         # (1, B)
        active = (d < depth).astype(jnp.float32)              # (1, B)
        if env.name == "connect4":
            col_oh = (_iota(C, B) == a).astype(jnp.float32)   # (C, B)
            h = jnp.sum(heights * col_oh, axis=0, keepdims=True)
            cell = (R - 1 - h.astype(jnp.int32)) * C + a
            heights = heights + col_oh * active
        else:
            cell = a
        cell_oh = (_iota(RC, B) == cell).astype(jnp.float32) * active
        mover = (rootp + d) % 2                               # (1, B)
        is0 = (mover == 0).astype(jnp.float32)
        p0 = p0 + cell_oh * is0
        p1 = p1 + cell_oh * (1.0 - is0)
        return p0, p1, heights

    p0, p1, heights = jax.lax.fori_loop(0, dcap, recon,
                                        (p0, p1, heights0))

    leaf_player = (rootp + depth) % 2                         # (1, B)
    leaf_mc = rootmc + depth
    mover_is0 = ((1 - leaf_player) == 0).astype(jnp.float32)
    mover_plane = p0 * mover_is0 + p1 * (1 - mover_is0)

    # win check: (L, RC) @ (RC, B) on the MXU
    W = W_ref[:]                                              # (RC, L)
    linesum = jnp.dot(W.T, mover_plane,
                      preferred_element_type=jnp.float32)     # (L, B)
    won = jnp.max(linesum, axis=0, keepdims=True) >= env.win_len
    terminal = ((won | (leaf_mc >= env.max_moves))
                & (root_case == 0)) | (root_case > 0)
    # root_case only happens for finished games (root unexpanded) → terminal
    tval = jnp.where(won, 1.0, 0.0)

    leaf = jnp.where(root_case > 0, 0,
                     jnp.where(alloc > 0,
                               jnp.full((1, B), 0, jnp.int32)  # slot filled by caller
                               , chsel.astype(jnp.int32)))

    # ---------------- legal moves at the leaf
    occ = p0 + p1                                             # (RC, B)
    if env.name == "connect4":
        valid = (heights < R).astype(jnp.float32)             # (C, B)
    elif env.name.startswith("gomoku"):
        D = aux_ref[:]                                        # (RC, RC)
        near = jnp.dot(D, occ, preferred_element_type=jnp.float32)
        empty = (occ == 0).astype(jnp.float32)
        center = (_iota(RC, B) == (R // 2) * C + C // 2).astype(jnp.float32)
        any_st = jnp.max(occ, axis=0, keepdims=True)
        valid = jnp.where(any_st > 0, (near > 0).astype(jnp.float32) * empty,
                          center)
    else:
        valid = (occ == 0).astype(jnp.float32)                # (RC=A, B)

    # ---------------- canonical observation
    p_is0 = (leaf_player == 0).astype(jnp.float32)
    mine = p0 * p_is0 + p1 * (1 - p_is0)
    theirs = p1 * p_is0 + p0 * (1 - p_is0)
    if env.feature_dim == 3:
        tomove = jnp.broadcast_to(leaf_player.astype(jnp.float32), (RC, B))
        obs = jnp.concatenate([mine, theirs, tomove], axis=0)
    else:
        obs = jnp.concatenate([mine, theirs], axis=0)
    obs_ref[:] = obs
    valid_ref[:] = valid
    meta_ref[:] = jnp.concatenate([
        depth.astype(jnp.float32),
        parent.astype(jnp.float32),
        action.astype(jnp.float32),
        alloc,
        leaf.astype(jnp.float32),
        terminal.astype(jnp.float32),
        tval,
        leaf_player.astype(jnp.float32),
    ], axis=0)
    flags_ref[:] = jnp.zeros_like(flags_ref)


# --------------------------------------------------------------------------
# update kernel: expansion + backup (in-place on the tree)
# --------------------------------------------------------------------------

def _update_kernel(env, cfg: MCTSConfig, dcap: int,
                   stats_ref, prior_ref, children_ref,
                   path_ref, meta_ref, valid_ref, probs_ref, value_ref,
                   slot_ref,
                   stats_out, prior_out, children_out):
    A = env.action_dim
    stats = stats_ref[:]
    N, B = stats.shape[1], stats.shape[2]
    meta = meta_ref[:]
    depth = meta[0:1].astype(jnp.int32)
    parent = meta[1:2].astype(jnp.int32)
    action = meta[2:3].astype(jnp.int32)
    alloc = meta[3:4]
    terminal = meta[5:6]
    tval = meta[6:7]
    slot = slot_ref[0, 0]

    # leaf resolved against the slot for allocations
    leaf_meta = meta[4:5].astype(jnp.int32)
    leaf = jnp.where((alloc > 0), slot, leaf_meta)

    probs = probs_ref[:]                                      # (A, B)
    value = value_ref[:]                                      # (1, B)
    do_expand = (alloc > 0) & (terminal == 0)

    # ---- expansion: prior row + expandedness live in this sim's slot
    valid = valid_ref[:] > 0
    prior_slot = jnp.where(do_expand & valid, probs, NEG)
    prior_out[:, pl.ds(slot, 1), :] = prior_slot[:, None, :]

    # ---- parent edge pointer (full masked rewrite in VMEM)
    ohp = (_iota(N, B) == jnp.where(alloc > 0, parent, N)).astype(jnp.float32)
    oha = (_iota(A, B) == action).astype(jnp.float32)
    edge = ohp[None] * oha[:, None, :]                        # (A, N, B)
    children_out[:] = jnp.where(edge > 0, slot.astype(jnp.float32),
                                children_ref[:])

    # ---- backup along the path (+ the leaf at level `depth`)
    leaf_value = jnp.where(terminal > 0, tval, -value)

    def bk(d, carry):
        visit, val, expd = carry
        nd = path_ref[pl.ds(d, 1), :]                         # (1, B)
        nd = jnp.where(d == depth, leaf, nd)                  # append leaf
        active = (d <= depth).astype(jnp.float32)
        sign = jnp.where((depth - d) % 2 == 0, 1.0, -1.0)
        oh = (_iota(N, B) == nd).astype(jnp.float32) * active
        visit = visit + oh
        val = val + oh * (sign * leaf_value)
        # the freshly expanded leaf becomes selectable
        expd = expd + oh * jnp.where((d == depth) & do_expand, 1.0, 0.0)
        return visit, val, expd

    visit, val, expd = jax.lax.fori_loop(
        0, dcap, bk, (stats[0], stats[1], stats[2]))
    stats_out[0, :, :] = visit
    stats_out[1, :, :] = val
    stats_out[2, :, :] = expd


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

def make_sim_step(env, cfg: MCTSConfig, batch: int, dcap: int,
                  interpret: bool = False):
    """Build (descend_fn, update_fn) pallas calls for one simulation."""
    A = env.action_dim
    RC = env.rows * env.cols
    N = cfg.num_simulations + 1
    B = batch
    F = env.feature_dim
    tables = _game_tables(env)
    W = jnp.asarray(tables["W"])
    if env.name == "connect4":
        aux = jnp.asarray(tables["colmat"])
    elif env.name.startswith("gomoku"):
        aux = jnp.asarray(tables["neigh"])
    else:
        aux = jnp.zeros((1, RC), jnp.float32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    descend = pl.pallas_call(
        functools.partial(_descend_kernel, env, cfg, dcap),
        out_shape=(
            jax.ShapeDtypeStruct((dcap, B), jnp.int32),    # path
            jax.ShapeDtypeStruct((dcap, B), jnp.int32),    # apath
            jax.ShapeDtypeStruct((8, B), jnp.float32),     # meta
            jax.ShapeDtypeStruct((F * RC, B), jnp.float32),  # obs
            jax.ShapeDtypeStruct((A, B), jnp.float32),     # valid
            jax.ShapeDtypeStruct((1, B), jnp.float32),     # flags pad
        ),
        in_specs=[vspec] * 8,
        out_specs=(vspec,) * 6,
        interpret=interpret,
    )

    update = pl.pallas_call(
        functools.partial(_update_kernel, env, cfg, dcap),
        out_shape=(
            jax.ShapeDtypeStruct((3, N, B), jnp.float32),
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),
        ),
        in_specs=[vspec] * 8 + [pl.BlockSpec((1, 1),
                                             memory_space=pltpu.SMEM)],
        out_specs=(vspec,) * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
    )

    def descend_fn(stats, prior, children, board, player, mc):
        return descend(stats, prior, children, board,
                       player, mc, W, aux)

    def update_fn(stats, prior, children, path, meta, valid, probs, value,
                  slot):
        slot_arr = jnp.asarray(slot, jnp.int32).reshape(1, 1)
        return update(stats, prior, children, path, meta, valid, probs,
                      value, slot_arr)

    return descend_fn, update_fn


def run_mcts_pallas(env, eval_fn, boards, players, move_counts, dones, rng,
                    cfg: MCTSConfig, use_dirichlet=None,
                    interpret: bool = False):
    """Pallas-path search with the same semantics/returns as
    :func:`alphazero_tpu.search.mcts.run_mcts` (network mode only)."""
    from alphazero_tpu.search.mcts import SearchResult, _prep_priors

    B = boards.shape[0]
    A = env.action_dim
    RC = env.rows * env.cols
    N = cfg.num_simulations + 1
    if use_dirichlet is None:
        use_dirichlet = jnp.full((B,), cfg.use_dirichlet)
    dcap = int(min(env.max_moves + 1, cfg.num_simulations + 1))
    descend_fn, update_fn = make_sim_step(env, cfg, B, dcap, interpret)

    # ---- root expansion (XLA; identical to the XLA engine)
    obs0 = jax.vmap(env.observation_from_board)(boards, players)
    probs0, value0 = eval_fn(obs0)
    noise = jax.random.dirichlet(
        rng, jnp.full((A,), cfg.dirichlet_alpha, jnp.float32), shape=(B,))
    noisy = (1.0 - cfg.dirichlet_eps) * probs0 + cfg.dirichlet_eps * noise
    probs0 = jnp.where(use_dirichlet[:, None], noisy, probs0)
    root_valid = jax.vmap(env.valid_mask_board)(boards, move_counts)
    live = ~dones
    root_prior = jnp.where(live[:, None],
                           _prep_priors(probs0, root_valid, False,
                                        jnp.float32), NEG)

    # transposed tree state (games in lanes)
    stats = jnp.zeros((3, N, B), jnp.float32)
    stats = stats.at[0, 0].set(1.0)
    stats = stats.at[1, 0].set(jnp.where(live, -value0, 0.0))
    stats = stats.at[2, 0].set(live.astype(jnp.float32))
    prior = jnp.full((A, N, B), NEG, jnp.float32)
    prior = prior.at[:, 0, :].set(root_prior.T)
    children = jnp.full((A, N, B), -1.0, jnp.float32)
    board_t = boards.astype(jnp.float32).reshape(B, 2, RC).transpose(1, 2, 0)
    player_t = players.astype(jnp.int32).reshape(1, B)
    mc_t = move_counts.astype(jnp.int32).reshape(1, B)

    def body(i, carry):
        stats, prior, children = carry
        path, apath, meta, obs, valid, _ = descend_fn(
            stats, prior, children, board_t, player_t, mc_t)
        probs, value = eval_fn(
            obs.T.reshape(B, env.feature_dim, env.rows, env.cols))
        stats, prior, children = update_fn(
            stats, prior, children, path, meta, valid,
            probs.astype(jnp.float32).T, value.astype(jnp.float32)
            .reshape(1, B), i)
        return stats, prior, children

    stats, prior, children = jax.lax.fori_loop(
        1, cfg.num_simulations, body, (stats, prior, children))

    # ---- root visit counts / q (same math as the XLA engine)
    child0 = children[:, 0, :].T.astype(jnp.int32)            # (B, A)
    oh = jax.nn.one_hot(child0, N, dtype=jnp.float32)
    visit_bn = stats[0].T                                      # (B, N)
    counts = jnp.einsum("ban,bn->ba", oh, visit_bn,
                        preferred_element_type=jnp.float32)
    counts = jnp.where(child0 >= 0, counts, 0.0).astype(jnp.int32)
    total = jnp.maximum(counts.sum(axis=-1), 1).astype(jnp.float32)
    policy = counts.astype(jnp.float32) / total[:, None]
    rq = stats[1, 0] / jnp.maximum(stats[0, 0], 1.0)
    return SearchResult(visit_counts=counts, policy=policy, root_q=rq,
                        tree=None)

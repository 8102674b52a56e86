"""Pallas TPU fast path for the per-simulation search machinery.

Motivation (measured): the XLA formulation spends ~220µs/simulation on
~40 small kernels (descent gathers, board reconstruction, terminal checks,
expansion writes, backup) — mostly fixed per-kernel overhead.  This module
consolidates ALL of it into ONE Pallas kernel per simulation, software-
pipelined with the network forward:

  sim_kernel(i): apply simulation i-1's expansion + backup (using the NN
    probs/value computed between kernels), then run simulation i's UCB
    descent, leaf-board replay (sequential gravity for connect4 — trivial
    inside VMEM), terminal detection (win-line matmul), legal mask, and
    canonical observation.  The tree stays aliased in place; a final
    update-only call flushes the last simulation.

Layout: "games in lanes" — every per-game vector is ``(X, B)`` with the
game batch B in the TPU lane dimension (multiples of 128), so all search
logic vectorizes uniformly across games.  Tree arrays are ``stats (3,N,B)``
[visit, value_sum, expanded], ``prior (A,N,B)``, ``children (A,N,B)``.

Mosaic constraints honored here: no bool vectors in while-loop carries
(int32 flags), no scatter/gather primitives (one-hot compares + lane
reductions; per-action loops are unrolled over the small A), dynamic ref
indexing only via ``pl.ds`` on sublane dimensions.

Scope: network-guided search (vanilla rollouts stay on the XLA path) for
games whose ``(A, N, B)`` arrays fit VMEM (connect4/tictactoe at benchmark
sizes; large-board gomoku uses the XLA path).  Semantics are IDENTICAL to
the XLA engine — verified by exact-equality tests in
tests/test_pallas_mcts.py.
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

NEG = -1e30


def _env_knob(name: str, default: int, cfg_val=None) -> int:
    """Tuning knob, clamped to ≥ 1.  Precedence: env var > ``cfg_val``
    (the corresponding MCTSConfig field, None = unset) > ``default``.

    These are TRACE-TIME constants: they bake into the first compilation of
    a given shape and changing them later in-process has no effect (the
    jit/pallas cache keys don't include the env var — config fields DO key
    the cache since the whole MCTSConfig participates in tracing closures).
    Values < 1 would silently corrupt search (AZ_NSEG=0 → empty segment
    range → zero simulations → root-prior-only counts), so clamp."""
    import os
    if cfg_val is not None:
        default = int(cfg_val)
    try:
        v = int(os.environ.get(name, default))
    except ValueError:
        return max(int(default), 1)
    return max(v, 1)


def _iota(n, b):
    return jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)


def supports(env, batch: int, cfg: MCTSConfig, vanilla: bool) -> bool:
    """Whether the Pallas path applies: TPU, network mode, lane-aligned
    batch, and tree arrays small enough for VMEM.

    The budget is the actual array footprint against the default 16M
    scoped-vmem allocation, with headroom: connect4-resnet at B=1024
    (15.1M by this formula) compiles standalone but fails remote
    compilation inside the full self-play program.  Raising
    ``vmem_limit_bytes`` instead was measured COUNTERPRODUCTIVE:
    requesting 100M on these kernels cost tictactoe 276k → 173k and
    connect4-resnet 14.1k → 9.0k env-steps/s (the larger budget degrades
    Mosaic's allocation even when unused), so batches that don't fit the
    default budget stay on the XLA engine."""
    if vanilla or batch % 128 != 0:
        return False
    N = cfg.num_simulations + 1
    A = env.action_dim
    # stats (3,N,B) + prior/children (A,N,B)×2 + obs/path/meta scratch
    tree_bytes = (3 + 2 * A) * N * batch * 4
    extra = (2 * env.feature_dim * env.rows * env.cols + 4 * A) * batch * 4
    if cfg.leaf_batch > 1:
        # leaf-batched rounds go through the XLA engine — the Pallas round
        # kernel was removed after measuring slower at every K (see the
        # tombstone note below / docs/DESIGN.md)
        return False
    if tree_bytes + extra > 14_000_000:
        return False
    if env.name.startswith("gomoku") and env.rows * env.cols > 128:
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
        tables["aux"] = colmat
    elif env.name.startswith("gomoku"):
        D = np.zeros((RC, RC), np.float32)
        for r in range(env.rows):
            for c in range(env.cols):
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < env.rows and 0 <= cc < env.cols:
                            D[r * env.cols + c, rr * env.cols + cc] = 1.0
        tables["aux"] = D
    else:
        tables["aux"] = np.zeros((1, RC), np.float32)
    return tables


def _apply_update(env, N, A, B, dcap, stats, prior_ref, children_ref,
                  path_ref, meta, valid, probs, value, slot, gate):
    """Expansion + backup of one completed simulation.  Mutates
    prior/children refs in place; returns the new (visit, val, expd).

    ``gate`` (scalar bool) turns the whole update into a no-op — used on
    the first pipelined call, where there is no previous simulation.
    Mask-gating is used instead of lax.cond so slot-0 writes can never
    clobber the root when the gate is off.
    """
    depth = meta[0:1].astype(jnp.int32)
    parent = meta[1:2].astype(jnp.int32)
    action = meta[2:3].astype(jnp.int32)
    alloc = meta[3:4]
    leaf_meta = meta[4:5].astype(jnp.int32)
    terminal = meta[5:6]
    tval = meta[6:7]
    leaf = jnp.where(alloc > 0, slot, leaf_meta)
    do_expand = (alloc > 0) & (terminal == 0)
    gatef = jnp.where(gate, 1.0, 0.0)

    # expansion: prior row into this sim's slot + parent edge pointer
    prior_slot = jnp.where(do_expand & (valid > 0), probs, NEG)
    old_row = prior_ref[:, pl.ds(slot, 1), :]
    prior_ref[:, pl.ds(slot, 1), :] = jnp.where(
        gate, prior_slot[:, None, :], old_row)
    ohp = (_iota(N, B) == jnp.where(alloc > 0, parent, N)).astype(jnp.float32)
    oha = (_iota(A, B) == action).astype(jnp.float32)
    edge = ohp[None] * oha[:, None, :] * gatef                # (A, N, B)
    children_ref[:] = jnp.where(edge > 0, slot.astype(jnp.float32),
                                children_ref[:])

    # backup along the path (+ leaf appended at level `depth`)
    leaf_value = jnp.where(terminal > 0, tval, -value)
    dmax = jnp.where(gate, jnp.max(depth), -1)

    def bk_cond(carry):
        return carry[0] <= dmax

    def bk(carry):
        d, visit, val, expd = carry
        nd = path_ref[pl.ds(d, 1), :]                         # (1, B)
        nd = jnp.where(d == depth, leaf, nd)
        active = (d <= depth).astype(jnp.float32) * gatef
        sign = jnp.where((depth - d) % 2 == 0, 1.0, -1.0)
        oh = (_iota(N, B) == nd).astype(jnp.float32) * active
        visit = visit + oh
        val = val + oh * (sign * leaf_value)
        expd = expd + oh * jnp.where((d == depth) & do_expand, 1.0, 0.0)
        return d + 1, visit, val, expd

    _, visit, val, expd = jax.lax.while_loop(
        bk_cond, bk, (0, stats[0], stats[1], stats[2]))
    return visit, val, expd


def _descend(env, cfg, N, A, B, dcap, visit, val, expd, prior, children,
             path_ref, apath_ref, path_off=0, board=None,
             root_cache=None, root_pv=None):
    """UCB walk root→frontier; records interior nodes/actions into
    path/apath refs (path rows at ``path_off``..``path_off+dcap`` — leaf-
    batched rounds give each rank its own path segment).  Returns
    (depth, parent, action, chsel) registers.

    With ``board=(p0, p1, heights, rootp)`` the leaf board is built IN the
    walk (each selected action is applied immediately), so callers skip the
    separate path-replay loop; returns ``(..., p0, p1, heights)``.

    ``expd=None`` selects ENC mode: ``visit`` carries
    ``true_visit + 0.5·expanded`` (exact in f32 — visits are integers far
    below 2²³).  This drops one of the three per-action child-stat gather
    passes, the dominant VPU cost of the walk; callers decode with
    ``floor``.

    ``children=None`` additionally selects PACKED mode: ``prior`` holds
    ``(child_id + 2) + prior_frac`` per edge, where prior_frac =
    round(prior·2¹⁴)·2⁻¹⁵ ∈ [0, 0.5] (exact alongside integer parts < 256
    — f32 has 2⁻¹⁵ resolution there) and integer part 0 encodes an
    illegal action.  One row gather replaces the separate prior+children
    gathers — with ENC that is 2 gather passes/step instead of the
    original 4.

    ``root_cache=(rc_visit, rc_val)`` (packed+enc+board mode only) peels
    the d=0 step out of the walk: every simulation's FIRST step reads the
    root's child stats from dedicated ``(A, B)`` mirror arrays (maintained
    incrementally by the backup — see ``_update_root_cache``) instead of
    the O(A·N·B) one-hot gathers, and the root's own visit count is the
    closed-form ``root_pv`` (= simulation slot: the root gains exactly one
    visit per simulation).  Bitwise-identical to the unpeeled walk."""
    R, C = env.rows, env.cols
    RC = R * C
    enc = expd is None
    packed = children is None
    assert not packed or enc, "packed mode requires enc mode"
    node0 = jnp.zeros((1, B), jnp.int32)
    if enc:
        pv0 = jnp.floor(visit[0:1, :])
        stop0 = (visit[0:1, :] == pv0).astype(jnp.int32)   # frac 0 ⇔ unexp.
    else:
        pv0 = visit[0:1, :]
        stop0 = (expd[0:1, :] == 0).astype(jnp.int32)
    depth0 = jnp.zeros((1, B), jnp.int32)
    parent0 = jnp.full((1, B), -1, jnp.int32)
    action0 = jnp.zeros((1, B), jnp.int32)
    chsel0 = jnp.zeros((1, B), jnp.float32)
    if board is not None:
        p0_0, p1_0, h0, rootp = board

    path_ref[pl.ds(path_off, dcap), :] = jnp.full((dcap, B), N, jnp.int32)
    apath_ref[:] = jnp.zeros((dcap, B), jnp.int32)

    def cond(c):
        return (c[0] < dcap) & (jnp.min(c[3]) < 1)

    def body(c):
        # WARNING: the ``root_cache`` branch below PEELS an exact copy of
        # this per-step math for d=0 (decode, q/explore/ucb, first-max
        # selection, freeze logic, board update) reading the (A, B) root
        # mirror instead of the one-hot gathers.  Any semantic edit here
        # MUST be mirrored there or the documented bitwise-identity
        # invariant silently breaks (tests: test_pallas_fused.py root-cache
        # equivalence + scripts/verify_fused_exact.py on-chip).
        d, node, pv, stop, depth, parent, action, chsel = c[:8]
        # 2x-unrolled callers may run one step past dcap: freeze every lane
        # so the overrun body is an exact no-op (all writes below preserve
        # frozen lanes' state).
        stop = jnp.where(d >= dcap, jnp.ones_like(stop), stop)
        dw = jnp.minimum(d, dcap - 1)                         # clamped row
        oh = (_iota(N, B) == node).astype(jnp.float32)        # (N, B)
        if packed:
            pcrow = jnp.sum(prior * oh[None], axis=1)         # (A, B)
            fl = jnp.floor(pcrow)
            crow = fl - 2.0
            prow = (pcrow - fl) * 2.0
            illegal = fl == 0
        else:
            prow = jnp.sum(prior * oh[None], axis=1)          # (A, B)
            crow = jnp.sum(children * oh[None], axis=1)       # (A, B)
        # child stats: unrolled over the small action dim (keeps VMEM
        # pressure at (N, B) instead of (A, N, B))
        cv, cl, ce = [], [], []
        for a in range(A):
            oha = (_iota(N, B) == crow[a:a + 1, :].astype(jnp.int32)
                   ).astype(jnp.float32)
            cv.append(jnp.sum(visit * oha, axis=0, keepdims=True))
            cl.append(jnp.sum(val * oha, axis=0, keepdims=True))
            if not enc:
                ce.append(jnp.sum(expd * oha, axis=0, keepdims=True))
        cvisit = jnp.concatenate(cv, axis=0)                  # (A, B)
        cvalue = jnp.concatenate(cl, axis=0)
        if enc:                       # decode visit+0.5·expanded
            cfloor = jnp.floor(cvisit)
            cexp = (cvisit - cfloor) * 2.0
            cvisit = cfloor
        else:
            cexp = jnp.concatenate(ce, axis=0)
        q = jnp.where(cvisit > 0, cvalue / jnp.maximum(cvisit, 1.0), 0.0)
        explore = prow * (jnp.sqrt(pv) / (cvisit + 1.0))
        if cfg.formula == "alphazero":
            explore = cfg.c_puct * explore
        ucb = q + explore
        if packed:
            ucb = jnp.where(illegal, NEG, ucb)
        act = _argmax_first(ucb, A, B)                        # (1, B)
        act_oh = (_iota(A, B) == act).astype(jnp.float32)
        c_sel = jnp.sum(crow * act_oh, axis=0, keepdims=True)
        v_sel = jnp.sum(cvisit * act_oh, axis=0, keepdims=True)
        e_sel = jnp.sum(cexp * act_oh, axis=0, keepdims=True)
        now_stop = ((c_sel < 0) | (e_sel == 0)).astype(jnp.int32)

        frozen = stop > 0
        # read-modify-write: frozen lanes keep the initialized sentinel/0,
        # so re-running the body never clobbers recorded path rows
        prow_old = path_ref[pl.ds(path_off + dw, 1), :]
        arow_old = apath_ref[pl.ds(dw, 1), :]
        path_ref[pl.ds(path_off + dw, 1), :] = jnp.where(frozen, prow_old,
                                                         node)
        apath_ref[pl.ds(dw, 1), :] = jnp.where(frozen, arow_old, act)
        parent = jnp.where(frozen, parent, node)
        action = jnp.where(frozen, action, act)
        chsel = jnp.where(frozen, chsel, c_sel)
        depth = jnp.where(frozen, depth, d + 1)
        node = jnp.where(frozen | (now_stop > 0), node,
                         c_sel.astype(jnp.int32))
        pv = jnp.where(frozen, pv, v_sel)
        out = (d + 1, node, pv, jnp.maximum(stop, now_stop), depth,
               parent, action, chsel)

        if board is not None:
            # apply the selected move for still-descending lanes — the
            # board tracks the walk, replacing the post-hoc replay loop
            p0, p1, heights = c[8:]
            active = 1.0 - frozen.astype(jnp.float32)         # (1, B)
            if env.name == "connect4":
                col_oh = (_iota(C, B) == act).astype(jnp.float32)
                h = jnp.sum(heights * col_oh, axis=0, keepdims=True)
                cell = (R - 1 - h.astype(jnp.int32)) * C + act
                heights = heights + col_oh * active
            else:
                cell = act
            cell_oh = (_iota(RC, B) == cell).astype(jnp.float32) * active
            mover = (rootp + d) % 2                           # (1, B)
            is0 = (mover == 0).astype(jnp.float32)
            p0 = p0 + cell_oh * is0
            p1 = p1 + cell_oh * (1.0 - is0)
            out = out + (p0, p1, heights)
        return out

    init = (0, node0, pv0, stop0, depth0, parent0, action0, chsel0)
    if board is not None:
        init = init + (p0_0, p1_0, h0)

    if root_cache is not None:
        # ---- peeled d=0 step: child stats from the (A, B) root mirror,
        # root visits = root_pv (scalar).  Mirrors the body below exactly.
        assert packed and enc and board is not None
        rc_visit, rc_val = root_cache[:2]
        pc0 = prior[:, 0, :]                                  # (A, B)
        fl0 = jnp.floor(pc0)
        crow0 = fl0 - 2.0
        prow0 = (pc0 - fl0) * 2.0
        cfloor0 = jnp.floor(rc_visit)
        cexp0 = (rc_visit - cfloor0) * 2.0
        q0 = jnp.where(cfloor0 > 0, rc_val / jnp.maximum(cfloor0, 1.0), 0.0)
        explore0 = prow0 * (jnp.sqrt(root_pv) / (cfloor0 + 1.0))
        if cfg.formula == "alphazero":
            explore0 = cfg.c_puct * explore0
        ucb0 = jnp.where(fl0 == 0, NEG, q0 + explore0)
        act0 = _argmax_first(ucb0, A, B)                      # (1, B)
        act0_oh = (_iota(A, B) == act0).astype(jnp.float32)
        c_sel0 = jnp.sum(crow0 * act0_oh, axis=0, keepdims=True)
        v_sel0 = jnp.sum(cfloor0 * act0_oh, axis=0, keepdims=True)
        e_sel0 = jnp.sum(cexp0 * act0_oh, axis=0, keepdims=True)
        now_stop0 = ((c_sel0 < 0) | (e_sel0 == 0)).astype(jnp.int32)
        frozen0 = stop0 > 0
        prow_old = path_ref[pl.ds(path_off, 1), :]
        arow_old = apath_ref[pl.ds(0, 1), :]
        path_ref[pl.ds(path_off, 1), :] = jnp.where(frozen0, prow_old,
                                                    node0)
        apath_ref[pl.ds(0, 1), :] = jnp.where(frozen0, arow_old, act0)
        parent1 = jnp.where(frozen0, parent0, node0)
        action1 = jnp.where(frozen0, action0, act0)
        chsel1 = jnp.where(frozen0, chsel0, c_sel0)
        depth1 = jnp.where(frozen0, depth0, 1)
        node1 = jnp.where(frozen0 | (now_stop0 > 0), node0,
                          c_sel0.astype(jnp.int32))
        pv1 = jnp.where(frozen0, pv0, v_sel0)
        stop1 = jnp.maximum(stop0, now_stop0)
        # apply the root move for active lanes (body's board update at d=0)
        active0 = 1.0 - frozen0.astype(jnp.float32)
        p0_1, p1_1, h1 = p0_0, p1_0, h0
        if env.name == "connect4":
            col_oh0 = (_iota(C, B) == act0).astype(jnp.float32)
            hh = jnp.sum(h0 * col_oh0, axis=0, keepdims=True)
            cell0 = (R - 1 - hh.astype(jnp.int32)) * C + act0
            h1 = h0 + col_oh0 * active0
        else:
            cell0 = act0
        cell_oh0 = (_iota(RC, B) == cell0).astype(jnp.float32) * active0
        is0_0 = (rootp == 0).astype(jnp.float32)              # mover at d=0
        p0_1 = p0_0 + cell_oh0 * is0_0
        p1_1 = p1_0 + cell_oh0 * (1.0 - is0_0)
        init = (1, node1, pv1, stop1, depth1, parent1, action1, chsel1,
                p0_1, p1_1, h1)

    if root_cache is not None and len(root_cache) >= 5 and dcap > 2:
        # ---- peeled d=1 step: the depth-1 node's edge row and its
        # children's stats come from (A, A, B) mirrors keyed by the root
        # action a0 (maintained by expansion/backup — pallas_fused
        # _update_d1_cache / the sim body's pc1 writes) instead of the
        # O(A·N·B) one-hot gathers.  Nearly every simulation executes a
        # d=1 step, so this removes the walk's second-most-expensive
        # gather pass entirely.  Mirrors the body exactly (see the
        # WARNING on ``body``); bitwise-identical results.
        pc1_m, rc1_visit, rc1_val = root_cache[2:5]
        frozen1 = stop1 > 0
        pcrow1 = jnp.sum(pc1_m * act0_oh[None], axis=1)       # (A, B)
        fl1 = jnp.floor(pcrow1)
        crow1 = fl1 - 2.0
        prow1 = (pcrow1 - fl1) * 2.0
        cv1 = jnp.sum(rc1_visit * act0_oh[None], axis=1)      # (A, B) enc
        cl1 = jnp.sum(rc1_val * act0_oh[None], axis=1)
        cfl1 = jnp.floor(cv1)
        cexp1 = (cv1 - cfl1) * 2.0
        q1 = jnp.where(cfl1 > 0, cl1 / jnp.maximum(cfl1, 1.0), 0.0)
        explore1 = prow1 * (jnp.sqrt(pv1) / (cfl1 + 1.0))
        if cfg.formula == "alphazero":
            explore1 = cfg.c_puct * explore1
        ucb1 = jnp.where(fl1 == 0, NEG, q1 + explore1)
        act1 = _argmax_first(ucb1, A, B)                      # (1, B)
        act1_oh = (_iota(A, B) == act1).astype(jnp.float32)
        c_sel1 = jnp.sum(crow1 * act1_oh, axis=0, keepdims=True)
        v_sel1 = jnp.sum(cfl1 * act1_oh, axis=0, keepdims=True)
        e_sel1 = jnp.sum(cexp1 * act1_oh, axis=0, keepdims=True)
        now_stop1 = ((c_sel1 < 0) | (e_sel1 == 0)).astype(jnp.int32)
        prow_old1 = path_ref[pl.ds(path_off + 1, 1), :]
        arow_old1 = apath_ref[pl.ds(1, 1), :]
        path_ref[pl.ds(path_off + 1, 1), :] = jnp.where(frozen1, prow_old1,
                                                        node1)
        apath_ref[pl.ds(1, 1), :] = jnp.where(frozen1, arow_old1, act1)
        parent2 = jnp.where(frozen1, parent1, node1)
        action2 = jnp.where(frozen1, action1, act1)
        chsel2 = jnp.where(frozen1, chsel1, c_sel1)
        depth2 = jnp.where(frozen1, depth1, 2)
        node2 = jnp.where(frozen1 | (now_stop1 > 0), node1,
                          c_sel1.astype(jnp.int32))
        pv2 = jnp.where(frozen1, pv1, v_sel1)
        stop2 = jnp.maximum(stop1, now_stop1)
        # apply the d=1 move for active lanes (body's board update)
        active1 = 1.0 - frozen1.astype(jnp.float32)
        if env.name == "connect4":
            col_oh1 = (_iota(C, B) == act1).astype(jnp.float32)
            hh1 = jnp.sum(h1 * col_oh1, axis=0, keepdims=True)
            cell1 = (R - 1 - hh1.astype(jnp.int32)) * C + act1
            h2 = h1 + col_oh1 * active1
        else:
            cell1 = act1
            h2 = h1
        cell_oh1 = (_iota(RC, B) == cell1).astype(jnp.float32) * active1
        is0_1 = jnp.asarray((rootp + 1) % 2 == 0, jnp.float32)  # mover d=1
        p0_2 = p0_1 + cell_oh1 * is0_1
        p1_2 = p1_1 + cell_oh1 * (1.0 - is0_1)
        init = (2, node2, pv2, stop2, depth2, parent2, action2, chsel2,
                p0_2, p1_2, h2)

    if root_cache is not None and len(root_cache) == 8 and dcap > 3:
        # ---- peeled d=2 step: the depth-2 node's edge row and its
        # children's (= depth-3 nodes') stats come from (A, A, A, B)
        # mirrors keyed (a1, a0) / (a2, a1, a0) — the triple uniquely
        # names the node in a tree.  With 200 sims most allocations land
        # at depth 3, so nearly every walk executes a d=2 step; peeling it
        # removes one O(A·N·B) gather iteration of the while-loop for all
        # of them.  Mirrors the body exactly (see the WARNING on ``body``);
        # bitwise-identical results.  Maintained by pallas_fused's sim
        # body (_update_d2_cache + the pc2 expansion/edge writes).
        pc2_m, rc2_visit, rc2_val = root_cache[5:]
        frozen2 = stop2 > 0
        # mirrors are (A, A², B) keyed k = a1·A + a0 (flat 3-D layout —
        # 4-D VMEM arrays hit Mosaic relayout limits)
        key01 = act1 * A + act0                               # (1, B)
        oh01 = (_iota(A * A, B) == key01).astype(jnp.float32)  # (A², B)
        pcrow2 = jnp.sum(pc2_m * oh01[None], axis=1)          # (A, B)
        fl2 = jnp.floor(pcrow2)
        crow2 = fl2 - 2.0
        prow2 = (pcrow2 - fl2) * 2.0
        cv2 = jnp.sum(rc2_visit * oh01[None], axis=1)         # (A, B)
        cl2 = jnp.sum(rc2_val * oh01[None], axis=1)
        cfl2 = jnp.floor(cv2)
        cexp2 = (cv2 - cfl2) * 2.0
        q2 = jnp.where(cfl2 > 0, cl2 / jnp.maximum(cfl2, 1.0), 0.0)
        explore2 = prow2 * (jnp.sqrt(pv2) / (cfl2 + 1.0))
        if cfg.formula == "alphazero":
            explore2 = cfg.c_puct * explore2
        ucb2 = jnp.where(fl2 == 0, NEG, q2 + explore2)
        act2 = _argmax_first(ucb2, A, B)                      # (1, B)
        act2_oh = (_iota(A, B) == act2).astype(jnp.float32)
        c_sel2 = jnp.sum(crow2 * act2_oh, axis=0, keepdims=True)
        v_sel2 = jnp.sum(cfl2 * act2_oh, axis=0, keepdims=True)
        e_sel2 = jnp.sum(cexp2 * act2_oh, axis=0, keepdims=True)
        now_stop2 = ((c_sel2 < 0) | (e_sel2 == 0)).astype(jnp.int32)
        prow_old2 = path_ref[pl.ds(path_off + 2, 1), :]
        arow_old2 = apath_ref[pl.ds(2, 1), :]
        path_ref[pl.ds(path_off + 2, 1), :] = jnp.where(frozen2, prow_old2,
                                                        node2)
        apath_ref[pl.ds(2, 1), :] = jnp.where(frozen2, arow_old2, act2)
        parent3 = jnp.where(frozen2, parent2, node2)
        action3 = jnp.where(frozen2, action2, act2)
        chsel3 = jnp.where(frozen2, chsel2, c_sel2)
        depth3 = jnp.where(frozen2, depth2, 3)
        node3 = jnp.where(frozen2 | (now_stop2 > 0), node2,
                          c_sel2.astype(jnp.int32))
        pv3 = jnp.where(frozen2, pv2, v_sel2)
        stop3 = jnp.maximum(stop2, now_stop2)
        # apply the d=2 move for active lanes (body's board update)
        active2 = 1.0 - frozen2.astype(jnp.float32)
        if env.name == "connect4":
            col_oh2 = (_iota(C, B) == act2).astype(jnp.float32)
            hh2 = jnp.sum(h2 * col_oh2, axis=0, keepdims=True)
            cell2 = (R - 1 - hh2.astype(jnp.int32)) * C + act2
            h3 = h2 + col_oh2 * active2
        else:
            cell2 = act2
            h3 = h2
        cell_oh2 = (_iota(RC, B) == cell2).astype(jnp.float32) * active2
        is0_2 = jnp.asarray((rootp + 2) % 2 == 0, jnp.float32)  # mover d=2
        p0_3 = p0_2 + cell_oh2 * is0_2
        p1_3 = p1_2 + cell_oh2 * (1.0 - is0_2)
        init = (3, node3, pv3, stop3, depth3, parent3, action3, chsel3,
                p0_3, p1_3, h3)
    # Unrolling trades loop-control overhead (branch + cross-lane
    # `min(stop)` reduction + scalar sync per iteration) against wasted
    # overrun bodies — the loop runs until the DEEPEST lane of the batch
    # stops, and frozen lanes still execute full-cost (exact no-op)
    # bodies.  Measured on v5e (scripts/prof_tune.py, connect4 flagship):
    # 2x wins once the root peel shortens every walk by one step
    # (78.6k env-steps/s vs 74.1k at 4x, 74.2k at 1x, 74.5k at 3x).
    unroll = _env_knob("AZ_DESC_UNROLL", 2 if root_cache is not None else 4,
                       cfg.desc_unroll)

    def nbody(c):
        for _ in range(unroll):
            c = body(c)
        return c

    res = jax.lax.while_loop(cond, nbody, init)
    depth, parent, action, chsel = res[4:8]
    if board is not None:
        return depth, parent, action, chsel, res[8], res[9], res[10]
    return depth, parent, action, chsel


def _sim_kernel(env, cfg: MCTSConfig, dcap: int,
                # inputs (pathin aliases the path output)
                stats_ref, prior_ref, children_ref, board_ref, player_ref,
                mc_ref, pathin_ref, W_ref, aux_ref, pmeta_ref, pvalid_ref,
                pprobs_ref, pvalue_ref, slot_ref,
                # outputs (stats/prior/children/path aliased in place)
                stats_out, prior_out, children_out, path_ref, apath_ref,
                meta_ref, obs_ref, valid_ref):
    """Pipelined step: flush sim i-1 (expansion+backup), then descend sim i.

    ``slot_ref[0,0]`` is sim i-1's slot; < 1 means nothing to flush (first
    loop iteration — the root was expanded host-side).  ``path_ref`` is an
    aliased in/out: it holds the PREVIOUS path on entry (consumed by the
    flush) and the new path on exit.
    """
    A = env.action_dim
    RC = env.rows * env.cols
    R, C = env.rows, env.cols
    stats = stats_ref[:]
    N, B = stats.shape[1], stats.shape[2]
    rootp = player_ref[:]
    rootmc = mc_ref[:]
    prev_slot = slot_ref[0, 0]

    # ---- flush previous simulation (gated off on the first call).
    # path_ref aliases pathin_ref, so it still holds the PREVIOUS path here.
    visit, val, expd = _apply_update(
        env, N, A, B, dcap, stats, prior_out, children_out, path_ref,
        pmeta_ref[:], pvalid_ref[:], pprobs_ref[:], pvalue_ref[:],
        prev_slot, prev_slot > 0)
    stats_out[0, :, :] = visit
    stats_out[1, :, :] = val
    stats_out[2, :, :] = expd

    # ---- descend current simulation (reads the just-updated tree)
    depth, parent, action, chsel = _descend(
        env, cfg, N, A, B, dcap, visit, val, expd, prior_out[:],
        children_out[:], path_ref, apath_ref)

    root_case = (parent < 0).astype(jnp.float32)
    alloc = ((parent >= 0) & (chsel < 0)).astype(jnp.float32)

    # ---- leaf board reconstruction (replay the path)
    p0 = board_ref[0, :, :].astype(jnp.float32)               # (RC, B)
    p1 = board_ref[1, :, :].astype(jnp.float32)
    if env.name == "connect4":
        colmat = aux_ref[:]                                   # (C, RC)
        heights0 = jnp.dot(colmat, p0 + p1,
                           preferred_element_type=jnp.float32)  # (C, B)
    else:
        heights0 = jnp.zeros((1, B), jnp.float32)
    dmax = jnp.max(depth)

    def recon_cond(carry):
        return carry[0] < dmax

    def recon(carry):
        d, p0, p1, heights = carry
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
        return d + 1, p0, p1, heights

    _, p0, p1, heights = jax.lax.while_loop(
        recon_cond, recon, (0, p0, p1, heights0))

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
    tval = jnp.where(won, 1.0, 0.0)
    leaf = jnp.where(root_case > 0, 0, chsel.astype(jnp.int32))

    # ---- legal moves at the leaf
    occ = p0 + p1                                             # (RC, B)
    if env.name == "connect4":
        valid = (heights < R).astype(jnp.float32)             # (C, B)
    elif env.name.startswith("gomoku"):
        D = aux_ref[:]                                        # (RC, RC)
        near = jnp.dot(D, occ, preferred_element_type=jnp.float32)
        empty = (occ == 0).astype(jnp.float32)
        center = (_iota(RC, B) == (R // 2) * C + C // 2).astype(jnp.float32)
        any_st = jnp.max(occ, axis=0, keepdims=True)
        valid = jnp.where(any_st > 0,
                          (near > 0).astype(jnp.float32) * empty, center)
    else:
        valid = (occ == 0).astype(jnp.float32)                # (RC=A, B)

    # ---- canonical observation
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


def _flush_kernel(env, cfg: MCTSConfig, dcap: int,
                  stats_ref, prior_ref, children_ref, path_ref, pmeta_ref,
                  pvalid_ref, pprobs_ref, pvalue_ref, slot_ref,
                  stats_out, prior_out, children_out):
    """Update-only call: flush the LAST simulation after the loop."""
    A = env.action_dim
    stats = stats_ref[:]
    N, B = stats.shape[1], stats.shape[2]
    visit, val, expd = _apply_update(
        env, N, A, B, dcap, stats, prior_out, children_out, path_ref,
        pmeta_ref[:], pvalid_ref[:], pprobs_ref[:], pvalue_ref[:],
        slot_ref[0, 0], slot_ref[0, 0] > 0)
    stats_out[0, :, :] = visit
    stats_out[1, :, :] = val
    stats_out[2, :, :] = expd


# --------------------------------------------------------------------------
# leaf-batched rounds: REMOVED after measurement (round 4)
# --------------------------------------------------------------------------
#
# A ~450-LoC Pallas round kernel (K virtual-loss descents sharing one
# K*B-position forward) lived here through round 3, reachable only from
# tests.  Measured on v5e against the per-sim pipelined engine for every
# eval-bound benchmark config, it LOST everywhere (docs/DESIGN.md "leaf
# batching" section): connect4-resnet 41.0-55.8 ms/move at K in {4,8,16}
# vs 36.2 ms at K=1; end-to-end gomoku9 408 vs 419 env-steps/s, gomoku15
# 84.9 vs 87.7.  The forward-efficiency gain of K*B-batch evals (70.8 ->
# 132 TFLOP/s for the gomoku9 tower at 8x batch) is fully offset by the
# serialized in-kernel descents and virtual-loss walks.  The XLA engine's
# leaf-batched rounds (search/mcts.py:_simulate_round) remain for configs
# whose tree exceeds VMEM; no preset enables them (same measurements).

def _leaf_finish(env, B, W_ref, aux_ref, rootp, rootmc, depth, root_case,
                 chsel, slot, alloc, p0, p1, heights):
    """Terminal check / legal mask / canonical observation for a leaf board
    that has already been built (by replay, or in-walk via ``_descend``'s
    board carry)."""
    RC = env.rows * env.cols
    R, C = env.rows, env.cols
    leaf_player = (rootp + depth) % 2
    leaf_mc = rootmc + depth
    mover_is0 = ((1 - leaf_player) == 0).astype(jnp.float32)
    mover_plane = p0 * mover_is0 + p1 * (1 - mover_is0)
    W = W_ref[:]
    linesum = jnp.dot(W.T, mover_plane, preferred_element_type=jnp.float32)
    won = jnp.max(linesum, axis=0, keepdims=True) >= env.win_len
    terminal = ((won | (leaf_mc >= env.max_moves))
                & (root_case == 0)) | (root_case > 0)
    tval = jnp.where(won, 1.0, 0.0)
    leaf = jnp.where(root_case > 0, 0,
                     jnp.where(alloc > 0, slot, chsel.astype(jnp.int32)))

    occ = p0 + p1
    if env.name == "connect4":
        valid = (heights < R).astype(jnp.float32)
    elif env.name.startswith("gomoku"):
        D = aux_ref[:]
        near = jnp.dot(D, occ, preferred_element_type=jnp.float32)
        empty = (occ == 0).astype(jnp.float32)
        center = (_iota(RC, B) == (R // 2) * C + C // 2).astype(jnp.float32)
        any_st = jnp.max(occ, axis=0, keepdims=True)
        valid = jnp.where(any_st > 0,
                          (near > 0).astype(jnp.float32) * empty, center)
    else:
        valid = (occ == 0).astype(jnp.float32)

    p_is0 = (leaf_player == 0).astype(jnp.float32)
    mine = p0 * p_is0 + p1 * (1 - p_is0)
    theirs = p1 * p_is0 + p0 * (1 - p_is0)
    if env.feature_dim == 3:
        tomove = jnp.broadcast_to(leaf_player.astype(jnp.float32), (RC, B))
        obs = jnp.concatenate([mine, theirs, tomove], axis=0)
    else:
        obs = jnp.concatenate([mine, theirs], axis=0)
    return leaf, terminal, tval, obs, valid


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

def make_sim_step(env, cfg: MCTSConfig, batch: int, dcap: int,
                  interpret: bool = False):
    """Build (sim_fn, flush_fn) pallas calls — see kernel docstrings."""
    A = env.action_dim
    RC = env.rows * env.cols
    N = cfg.num_simulations + 1
    B = batch
    F = env.feature_dim
    tables = _game_tables(env)
    W = jnp.asarray(tables["W"])
    aux = jnp.asarray(tables["aux"])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)

    sim = pl.pallas_call(
        functools.partial(_sim_kernel, env, cfg, dcap),
        out_shape=(
            jax.ShapeDtypeStruct((3, N, B), jnp.float32),    # stats
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),    # prior
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),    # children
            jax.ShapeDtypeStruct((dcap, B), jnp.int32),      # path
            jax.ShapeDtypeStruct((dcap, B), jnp.int32),      # apath
            jax.ShapeDtypeStruct((8, B), jnp.float32),       # meta
            jax.ShapeDtypeStruct((F * RC, B), jnp.float32),  # obs
            jax.ShapeDtypeStruct((A, B), jnp.float32),       # valid
        ),
        in_specs=[vspec] * 13 + [sspec],
        out_specs=(vspec,) * 8,
        # stats/prior/children and the previous path alias in place
        input_output_aliases={0: 0, 1: 1, 2: 2, 6: 3},
        interpret=interpret,
    )

    flush = pl.pallas_call(
        functools.partial(_flush_kernel, env, cfg, dcap),
        out_shape=(
            jax.ShapeDtypeStruct((3, N, B), jnp.float32),
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),
            jax.ShapeDtypeStruct((A, N, B), jnp.float32),
        ),
        in_specs=[vspec] * 8 + [sspec],
        out_specs=(vspec,) * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
    )

    def sim_fn(stats, prior, children, board, player, mc, path, pmeta,
               pvalid, pprobs, pvalue, prev_slot):
        slot_arr = jnp.asarray(prev_slot, jnp.int32).reshape(1, 1)
        return sim(stats, prior, children, board, player, mc, path, W,
                   aux, pmeta, pvalid, pprobs, pvalue, slot_arr)

    def flush_fn(stats, prior, children, path, meta, valid, probs, value,
                 slot):
        slot_arr = jnp.asarray(slot, jnp.int32).reshape(1, 1)
        return flush(stats, prior, children, path, meta, valid, probs,
                     value, slot_arr)

    return sim_fn, flush_fn


def run_mcts_pallas(env, eval_fn, boards, players, move_counts, dones, rng,
                    cfg: MCTSConfig, use_dirichlet=None,
                    interpret: bool = False):
    """Pallas-path search with the same semantics/returns as
    :func:`alphazero_tpu.search.mcts.run_mcts` (network mode only)."""
    if cfg.leaf_batch > 1:
        raise ValueError(
            "leaf_batch > 1 has no Pallas path (the round kernel was "
            "removed after measuring slower at every K — see the module "
            "note); use backend='xla' or 'auto'")
    from alphazero_tpu.search.mcts import SearchResult, _prep_priors

    B = boards.shape[0]
    A = env.action_dim
    RC = env.rows * env.cols
    N = cfg.num_simulations + 1
    if use_dirichlet is None:
        use_dirichlet = jnp.full((B,), cfg.use_dirichlet)
    dcap = int(min(env.max_moves + 1, cfg.num_simulations + 1))
    sim_fn, flush_fn = make_sim_step(env, cfg, B, dcap, interpret)

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

    path0 = jnp.full((dcap, B), N, jnp.int32)
    meta0 = jnp.zeros((8, B), jnp.float32)
    valid0 = jnp.zeros((A, B), jnp.float32)
    probsT0 = jnp.zeros((A, B), jnp.float32)
    pval0 = jnp.zeros((1, B), jnp.float32)

    def body(i, carry):
        (stats, prior, children, path, pmeta, pvalid, pprobs, pvalue) = carry
        stats, prior, children, path, apath, meta, obs, valid = sim_fn(
            stats, prior, children, board_t, player_t, mc_t, path, pmeta,
            pvalid, pprobs, pvalue, i - 1)
        probs, value = eval_fn(
            obs.T.reshape(B, env.feature_dim, env.rows, env.cols))
        return (stats, prior, children, path, meta, valid,
                probs.astype(jnp.float32).T,
                value.astype(jnp.float32).reshape(1, B))

    (stats, prior, children, path, pmeta, pvalid, pprobs, pvalue) = \
        jax.lax.fori_loop(
            1, cfg.num_simulations, body,
            (stats, prior, children, path0, meta0, valid0, probsT0, pval0))
    # flush the last simulation
    if cfg.num_simulations > 1:
        stats, prior, children = flush_fn(
            stats, prior, children, path, pmeta, pvalid, pprobs, pvalue,
            cfg.num_simulations - 1)

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

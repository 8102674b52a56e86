"""Whole-move fused search: MCTS + dense network in ONE Pallas kernel.

The sequential engine pays, per simulation, one kernel launch plus a full
HBM round-trip of the tree arrays (~14MB for the connect4 benchmark) and an
XLA-dispatched network forward.  This kernel keeps the tree, the network
weights, and all activations resident in VMEM for the ENTIRE move: a
``fori_loop`` over simulations runs descend → leaf replay → dense forward
(models/dense.py as games-in-lanes matmuls, zero layout transposes) →
expand → backup back-to-back on-core, and only root visit counts / root Q
leave the chip.

Applies to the ``dense`` model family (matmul tower — convs would need the
parked im2col machinery of ops/pallas_resnet.py).  Root evaluation +
Dirichlet noise stay host-side (identical to the other engines); the kernel
runs simulations 1..S-1.  Numerics: tree math in f32 exactly as the other
engines; network matmuls in bf16 with f32 accumulation (same class as the
flax compute path).  The in-kernel forward is BITWISE-identical to the
same jnp code compiled by XLA at production batch shapes (value head
padded to 8 MXU rows — see _pack_dense_params), so whole real-weights
trajectories are pinned bitwise against the XLA engine on-chip
(scripts/verify_fused_exact.py); interpret-mode tests pin search logic
with exact stubs (tests/test_pallas_fused.py).

Reference semantics preserved (ai/mcts.py:11-60, utils.py:29-44,
ai/node.py:62-74): PUCT with no c_puct, terminal backup +1 mover / 0 draw,
NN leaf backs up −value with per-ply negation, first-max tie-break in
ascending action order.
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
from alphazero_tpu.search.pallas_mcts import (NEG, _argmax_first, _descend,
                                              _game_tables, _iota,
                                              _leaf_finish)

from alphazero_tpu.search.pallas_mcts import _env_knob

BF = jnp.bfloat16


def supports_fused(env, batch: int, cfg: MCTSConfig, model) -> bool:
    """Dense-family, network-mode, lane-aligned, sequential (leaf_batch=1),
    and tree + weights fit scoped VMEM."""
    from alphazero_tpu.models.dense import DenseTower
    if not isinstance(model, DenseTower):
        return False
    if cfg.leaf_batch != 1 or batch % 128 != 0:
        return False
    # Packed (child_id+2)+prior_frac edges are exact only while the integer
    # part stays < 512 (f32 spacing is 2^-15 up to 512, matching _qfrac's
    # grid); child ids reach num_simulations, so bound the sim count.
    if cfg.num_simulations + 2 >= 512:
        return False
    N = cfg.num_simulations + 1
    A = env.action_dim
    tree_bytes = (2 + A) * N * batch * 4   # visit+val + packed edges
    if _use_d1(env):  # d=1 peel mirrors: three (A, A, B) buffers
        tree_bytes += 3 * A * A * batch * 4
    if _use_d2(env):  # d=2 peel mirrors: three (A, A², B) buffers
        tree_bytes += 3 * A * A * A * batch * 4
    weight_bytes = 2 * (model.width * model.width * 2 * model.blocks
                        + model.width * 600)
    act_bytes = 8 * model.width * batch * 4
    # the kernel requests vmem_limit_bytes=100M (v5e VMEM is 128M; the
    # default 16M is a compiler pipelining reservation, irrelevant here —
    # a whole-move kernel does no HBM streaming)
    if tree_bytes + weight_bytes + act_bytes > 80_000_000:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _pack_dense_params(model, params):
    """Flax param tree → flat list of (out, in)-layout arrays + metadata.

    Matmul weights are pre-cast to bf16 (halves VMEM, matches the flax
    compute dtype); LayerNorm/bias/head params stay f32.
    """
    def wT(p):  # flax Dense kernel is (in, out) → kernel wants (out, in)
        return jnp.asarray(p["kernel"]).T
    def b2(p, d):
        return jnp.asarray(p["bias"]).reshape(d, 1)

    ws = []
    ws.append(wT(params["stem"]).astype(BF))
    ws.append(b2(params["stem"], model.width))
    for i in range(model.blocks):
        blk = params[f"block_{i}"]
        ws.append(jnp.asarray(blk["ln"]["scale"]).reshape(-1, 1))
        ws.append(jnp.asarray(blk["ln"]["bias"]).reshape(-1, 1))
        ws.append(wT(blk["fc1"]).astype(BF))
        ws.append(b2(blk["fc1"], model.width))
        ws.append(wT(blk["fc2"]).astype(BF))
        ws.append(b2(blk["fc2"], model.width))
    ws.append(jnp.asarray(params["final_ln"]["scale"]).reshape(-1, 1))
    ws.append(jnp.asarray(params["final_ln"]["bias"]).reshape(-1, 1))
    ws.append(wT(params["policy_head"]))                      # f32 (A, D)
    ws.append(b2(params["policy_head"], model.action_dim))
    ws.append(wT(params["value_fc"]).astype(BF))
    ws.append(b2(params["value_fc"], model.width // 4))
    # value head padded (1, D/4) → (8, D/4): M=1 f32 dots lower to a VPU
    # reduction in XLA but the MXU in Mosaic (≈2e-3 divergence); at M=8
    # both use the MXU and row 0 is bitwise-identical across compilers
    # (scripts/verify_fused_exact.py real_forward_bitwise)
    wvh = wT(params["value_head"])                            # f32 (1, D/4)
    ws.append(jnp.zeros((8, wvh.shape[1]), jnp.float32).at[0:1].set(wvh))
    ws.append(b2(params["value_head"], 1))
    return ws


def _use_d1(env) -> bool:
    """Whether the d=1 peel's three (A, A, B) mirrors fit the VMEM plan:
    at gomoku9's A=81 they cost 3·A²·B·4 ≈ 20 MB and push the A=81 chunk
    kernel ~0.7 MB past the 100 MB scoped budget (measured), so large-A
    dense envs run with the d=0 peel only."""
    return env.action_dim <= 32


def _use_d2(env) -> bool:
    """Whether the d=2 peel's (A, A², B) mirrors are worth their VMEM
    and maintenance: the A³ keyspace must stay small (connect4 A=7,
    tictactoe A=9 — the dense-family envs)."""
    return env.action_dim <= 16


def _qfrac(p):
    """Quantize a prior ``p`` ∈ [0,1] to the packed fraction
    ``round(p·2¹⁴)·2⁻¹⁵`` ∈ [0, 0.5] — exactly representable in f32 next
    to integer parts < 256 (see pallas_mcts._descend packed mode)."""
    return jnp.floor(p * 16384.0 + 0.5) * (1.0 / 32768.0)


def _ln(h, scale, bias, eps=1e-6):
    """LayerNorm over the feature (sublane) dim of ``h (D, B)``, f32."""
    mu = jnp.mean(h, axis=0, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=0, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _mm(W, x):
    """bf16 matmul with f32 accumulation: ``W (O, I)`` bf16 · ``x (I, B)``."""
    return jnp.dot(W, x.astype(BF), preferred_element_type=jnp.float32)


def _dense_forward(env, model, wrefs, obs, W_lines):
    """models/dense.py forward in games-in-lanes layout.

    ``obs (F·RC, B)`` f32 rows [mine, theirs, (tomove)] — exactly the
    flax model's ``x.reshape(B, -1)`` order transposed.  Returns
    (probs (A, B) f32 softmax over actions, value (1, B) f32).
    """
    RC = env.rows * env.cols
    mine = obs[0:RC]
    theirs = obs[RC:2 * RC]
    lines_m = jnp.dot(W_lines.T, mine, preferred_element_type=jnp.float32)
    lines_t = jnp.dot(W_lines.T, theirs, preferred_element_type=jnp.float32)
    x = jnp.concatenate(
        [obs, lines_m / env.win_len, lines_t / env.win_len], axis=0)

    i = 0
    def nxt():
        nonlocal i
        r = wrefs[i][:]
        i += 1
        return r

    h = _mm(nxt(), x) + nxt()                                 # stem
    for _ in range(model.blocks):
        s, b = nxt(), nxt()
        y = _ln(h, s, b)
        y = jnp.maximum(_mm(nxt(), y) + nxt(), 0.0)           # fc1+relu
        y = _mm(nxt(), y) + nxt()                             # fc2
        h = h + y
    h = _ln(h, nxt(), nxt())                                  # final_ln
    logits = jnp.dot(nxt(), h, preferred_element_type=jnp.float32) + nxt()
    v = jnp.maximum(_mm(nxt(), h) + nxt(), 0.0)               # value_fc
    value = jnp.tanh(                                         # 8-row head:
        jnp.dot(nxt(), v,                                     # row 0 real,
                preferred_element_type=jnp.float32)[0:1]      # rest zero
        + nxt())
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)
    return probs, value


def _dense_forward_2x(env, model, wrefs, obs, W_lines, n_way=2):
    """_dense_forward with the batch split into ``n_way`` lane groups and
    the groups' stage chains INTERLEAVED.

    The forward is a dependent chain mm → LN/act (VPU) → mm → …; with
    in-order issue the VPU stalls on every matmul, so MXU and VPU
    serialize.  Rotating the groups' stages puts other groups' VPU stages
    between a matmul's issue and its consumer — the matmul executes under
    the VPU work (measured: independent MXU/VPU chains overlap perfectly,
    scripts/prof_overlap.py).  Lanes never mix in any op, so per group
    the values are bitwise-identical to _dense_forward.  ``n_way`` groups
    must keep ≥128 lanes each; AZ_FWD_NWAY overrides the dispatch choice
    (measured on v5e: 2-way wins — see docs/DESIGN.md round-4 notes).
    """
    RC = env.rows * env.cols
    B = obs.shape[1]
    H = B // n_way
    ws = [w[:] for w in wrefs]
    nb = model.blocks

    def prep(o):
        mine = o[0:RC]
        theirs = o[RC:2 * RC]
        lm = jnp.dot(W_lines.T, mine, preferred_element_type=jnp.float32)
        lt = jnp.dot(W_lines.T, theirs, preferred_element_type=jnp.float32)
        return jnp.concatenate(
            [o, lm / env.win_len, lt / env.win_len], axis=0)

    # weight unpack (layout: _pack_dense_params)
    Wst, bst = ws[0], ws[1]
    blk = [ws[2 + 6 * k: 8 + 6 * k] for k in range(nb)]  # s, b, W1, b1, W2, b2
    sf, bf, Wpol, bpol, Wvfc, bvfc, Wvh, bvh = ws[2 + 6 * nb:]

    def step(st, si):
        """One (VPU chunk → MXU issue) stage of a single half."""
        if si == 0:
            st["p"] = _mm(Wst, prep(st["x"]))
        elif si <= 2 * nb:
            k, phase = divmod(si - 1, 2)
            s, b, W1, b1, W2, b2 = blk[k]
            if phase == 0:   # vpu: finish residual, LN; mxu: fc1
                # residual adds parenthesized as h + (p + bias): float add
                # is non-associative and _dense_forward computes
                # h + (mm_out + bias) — required for bitwise parity
                # (tests/test_pallas_fused.py interleaved-forward test)
                st["h"] = (st["p"] + bst if k == 0
                           else st["h"] + (st["p"] + blk[k - 1][5]))
                st["p"] = _mm(W1, _ln(st["h"], s, b))
            else:            # vpu: relu; mxu: fc2
                st["p"] = _mm(W2, jnp.maximum(st["p"] + b1, 0.0))
        elif si == 2 * nb + 1:   # final ln; policy + value_fc matmuls
            st["h"] = _ln(st["h"] + (st["p"] + blk[nb - 1][5]), sf, bf)
            st["pl"] = jnp.dot(Wpol, st["h"],
                               preferred_element_type=jnp.float32)
            st["p"] = _mm(Wvfc, st["h"])
        elif si == 2 * nb + 2:   # value hidden relu; value head matmul
            st["p"] = jnp.dot(Wvh, jnp.maximum(st["p"] + bvfc, 0.0),
                              preferred_element_type=jnp.float32)[0:1]
        else:                    # softmax + tanh (pure VPU)
            logits = st["pl"] + bpol
            m = jnp.max(logits, axis=0, keepdims=True)
            e = jnp.exp(logits - m)
            st["probs"] = e / jnp.sum(e, axis=0, keepdims=True)
            st["value"] = jnp.tanh(st["p"] + bvh)

    groups = [{"x": obs[:, g * H:(g + 1) * H]} for g in range(n_way)]
    for si in range(2 * nb + 4):
        for st in groups:
            step(st, si)
    probs = jnp.concatenate([st["probs"] for st in groups], axis=1)
    value = jnp.concatenate([st["value"] for st in groups], axis=1)
    return probs, value


def _leaf_eval(env, model, wrefs, obs, W_lines, cfg=None):
    """Leaf/root evaluation dispatch: interleaved n-way forward when the
    lane count splits into ≥128-lane groups, else the plain chain.  Tests
    monkeypatch THIS hook to stub the network."""
    n_way = _env_knob("AZ_FWD_NWAY", 2, cfg.fwd_nway if cfg else None)
    if n_way > 1 and obs.shape[1] % (128 * n_way) == 0:
        return _dense_forward_2x(env, model, wrefs, obs, W_lines,
                                 n_way=n_way)
    return _dense_forward(env, model, wrefs, obs, W_lines)

def _update_root_cache(A, B, rcv_ref, rcq_ref, a0, depth, do_expand,
                       leaf_value):
    """Incremental update of the (A, B) root-child stat mirrors after one
    simulation's backup: the root child on edge ``a0`` (= apath[0]) gains
    the same visit increment (enc-coded: +0.5 when the depth-1 leaf just
    expanded) and signed value the backup wrote into its tree row.  Lanes
    that never left the root (dead games, depth 0) are skipped."""
    live1 = depth >= 1
    ohA = ((_iota(A, B) == a0) & live1).astype(jnp.float32)
    inc1 = 1.0 + jnp.where((depth == 1) & do_expand, 0.5, 0.0)
    sign1 = jnp.where((depth - 1) % 2 == 0, 1.0, -1.0)
    rcv_ref[:] = rcv_ref[:] + ohA * inc1
    rcq_ref[:] = rcq_ref[:] + ohA * (sign1 * leaf_value)


def _update_d1_cache(A, B, rcv1_ref, rcq1_ref, a0, a1, depth, do_expand,
                     leaf_value):
    """Same incremental maintenance one level deeper: the (A, A, B)
    mirrors hold the enc visit / value sums of DEPTH-2 nodes keyed
    (child action a1, root action a0) — in a tree the pair identifies the
    node uniquely.  The backup's d=2 ply adds ``inc`` (+0.5 enc when the
    depth-2 leaf just expanded) and ``sign·leaf_value`` exactly as it
    does into the node's ``visit_s``/``val_s`` rows, so the peeled d=1
    step (pallas_mcts._descend) reads bitwise-identical stats."""
    live2 = (depth >= 2).astype(jnp.float32)                  # (1, B)
    ohA0 = (_iota(A, B) == a0).astype(jnp.float32)            # (A, B)
    ohA1 = (_iota(A, B) == a1).astype(jnp.float32)
    m3 = ohA1[:, None, :] * ohA0[None] * live2[None]          # (A, A, B)
    inc2 = 1.0 + jnp.where((depth == 2) & do_expand, 0.5, 0.0)
    sign2 = jnp.where((depth - 2) % 2 == 0, 1.0, -1.0)
    rcv1_ref[:] = rcv1_ref[:] + m3 * inc2[None]
    rcq1_ref[:] = rcq1_ref[:] + m3 * (sign2 * leaf_value)[None]


def _update_d2_cache(A, B, rcv2_ref, rcq2_ref, a0, a1, a2, depth,
                     do_expand, leaf_value):
    """Mirror maintenance one level below _update_d1_cache: the
    (A, A², B) mirrors hold the enc visit / value sums of DEPTH-3 nodes
    keyed (a2, k = a1·A + a0) — the triple uniquely names the node in a
    tree.  The backup's d=3 ply adds ``inc`` (+0.5 enc on fresh
    expansion) and ``sign·leaf_value`` exactly as it does into the node's
    tree rows, so the peeled d=2 step (pallas_mcts._descend) reads
    bitwise-identical stats."""
    live3 = (depth >= 3).astype(jnp.float32)                  # (1, B)
    oh01 = (_iota(A * A, B) == (a1 * A + a0)).astype(jnp.float32)
    ohA2 = (_iota(A, B) == a2).astype(jnp.float32)
    m4 = ohA2[:, None, :] * (oh01 * live3)[None]              # (A, A², B)
    inc3 = 1.0 + jnp.where((depth == 3) & do_expand, 0.5, 0.0)
    sign3 = jnp.where((depth - 3) % 2 == 0, 1.0, -1.0)
    rcv2_ref[:] = rcv2_ref[:] + m4 * inc3[None]
    rcq2_ref[:] = rcq2_ref[:] + m4 * (sign3 * leaf_value)[None]


def _run_move_sims(env, cfg: MCTSConfig, model, dcap: int, wrefs,
                   W_ref, aux_ref, get_board, rootp, rootmc,
                   visit_s, val_s, pc_s,
                   path_s, apath_s, rc=None):
    """Simulations 1..S-1 on an already-initialized tree (root expanded).

    Shared by the single-move kernel (root eval host-side) and the
    multi-move self-play kernel (root eval in-kernel).  ``get_board()``
    returns the CURRENT root planes ``(p0, p1) (RC, B)`` f32.

    ``visit_s`` is ENC-coded ``visit + 0.5·expanded`` and ``pc_s`` is the
    PACKED ``(child_id+2)+prior_frac`` edge array (both exact in f32) —
    together they cut the per-step gather passes of the descent from 4
    arrays to 2 (see pallas_mcts._descend enc/packed modes).
    """
    A = env.action_dim
    N, B = visit_s.shape
    import os
    rc_use = rc
    if rc is not None and os.environ.get("AZ_NO_D1"):
        rc_use = rc[:2]            # A/B: disable the d=1 peel/mirrors
    elif rc is not None and os.environ.get("AZ_NO_D2"):
        rc_use = rc[:5]            # A/B: disable the d=2 peel/mirrors
    if rc_use is not None:
        # mirror _descend's dcap gates: a dcap-2/3 tree has no depth-2/3
        # nodes, and _apply_sim's d1/d2 maintenance would slice apath
        # rows past the (dcap, B) refs at trace time
        if dcap <= 2:
            rc_use = rc_use[:2]
        elif dcap <= 3:
            rc_use = rc_use[:5]

    def make_sim(Nc):
        """Simulation body over the first ``Nc`` tree rows only.

        Simulation ``slot`` can only reference nodes < ``slot``, so every
        (N, B) op is restricted to the rows a segment can actually touch —
        bitwise-identical results (excluded rows contribute exact zeros to
        the one-hot contractions) at a fraction of the VPU work.
        """

        def sim(slot, _):
            pend = _descend_leaf(env, cfg, model, dcap, W_ref, aux_ref,
                                 get_board, rootp, rootmc, visit_s, val_s,
                                 pc_s, path_s, apath_s, Nc, slot, rc=rc_use)
            probs, value = _leaf_eval(env, model, wrefs, pend["obs"],
                                      W_ref[:], cfg)
            _apply_sim(env, cfg, dcap, visit_s, val_s, pc_s, path_s,
                       apath_s, Nc, slot, pend, probs, value, rc=rc_use)
            return 0

        return sim

    # Segment the sim loop so early simulations run on small tree windows.
    # Row budget: simulation s backs up into row ``leaf`` ≤ s, so sims
    # [lo, hi) need Nc ≥ hi rows (rounded to the 8-sublane tile).
    S = cfg.num_simulations
    n_seg = _env_knob("AZ_NSEG", 4 if S >= 128 else (2 if S >= 64 else 1),
                      cfg.nseg)
    # n_seg may exceed S when a preset's tuned value meets a small --sims
    # override (e.g. the dryrun's 8 sims with the connect4 preset's 10):
    # degenerate segments would trace zero-row tree windows, so skip them
    lo = 1
    for k in range(1, n_seg + 1):
        hi = min(S, -(-S * k) // n_seg)
        if hi <= lo:            # empty segment (the loop runs sims 1..S-1)
            continue
        Nc = min(N, -(-hi // 8) * 8)
        jax.lax.fori_loop(lo, hi, make_sim(Nc), 0)
        lo = hi


def _descend_leaf(env, cfg, model, dcap, W_ref, aux_ref, get_board, rootp,
                  rootmc, visit_s, val_s, pc_s, path_s,
                  apath_s, Nc, slot, rc=None):
    """Descend + leaf machinery of one simulation (no tree writes except
    path/apath); returns the pending leaf state for a later apply.
    ``pc_s`` is the PACKED (child_id+2)+prior_frac edge array."""
    A = env.action_dim
    B = visit_s.shape[1]
    p0_r, p1_r = get_board()
    if env.name == "connect4":
        h0 = jnp.dot(aux_ref[:], p0_r + p1_r,
                     preferred_element_type=jnp.float32)
    else:
        h0 = jnp.zeros((1, B), jnp.float32)
    depth, parent, action, chsel, p0, p1, heights = _descend(
        env, cfg, Nc, A, B, dcap, visit_s[0:Nc, :], val_s[0:Nc, :], None,
        pc_s[:, 0:Nc, :], None, path_s, apath_s,
        board=(p0_r, p1_r, h0, rootp),
        root_cache=(None if rc is None else tuple(r[:] for r in rc)),
        root_pv=slot.astype(jnp.float32))
    root_case = (parent < 0).astype(jnp.float32)
    alloc = ((parent >= 0) & (chsel < 0)).astype(jnp.float32)
    leaf, terminal, tval, obs, valid = _leaf_finish(
        env, B, W_ref, aux_ref, rootp, rootmc, depth, root_case,
        chsel, slot, alloc, p0, p1, heights)
    # everything here rides a fori_loop carry — Mosaic cannot legalize
    # bool (i1) vectors in scf.for carries, so keep fields f32/i32
    # (_apply_sim reads a0/a1/a2 from the half's apath ref directly)
    return dict(obs=obs, valid=valid, depth=depth, parent=parent,
                action=action, alloc=alloc, leaf=leaf,
                terminal=terminal.astype(jnp.float32), tval=tval)


def _apply_sim(env, cfg, dcap, visit_s, val_s, pc_s, path_s, apath_s,
               Nc, slot, pend, probs, value, rc=None):
    """Expansion + mirror maintenance + backup of a completed simulation
    (enc-coded visit, packed prior+children edges).

    ``rc`` is the ACTIVE mirror tuple — ``(rcv, rcq[, pc1, rcv1, rcq1
    [, pc2, rcv2, rcq2]])`` — and gates which peel levels are maintained.
    With the full 8-tuple the backup runs DEAD-ROW SKIPPED: tree rows of
    depth-1..3 nodes are write-only (every read goes through the peeled
    steps' mirrors, and body steps at d >= 3 gather only depth-4+
    children), so plies 1..3 drop — their effect lives entirely in the
    ``_update_*_cache`` calls — and ply 0 (always row 0: path[0] is the
    root and a depth-0 walk's leaf IS the root, _leaf_finish) applies as
    a single-row ref update that _root_counts still reads."""
    A = env.action_dim
    B = visit_s.shape[1]
    alloc, depth, leaf = pend["alloc"], pend["depth"], pend["leaf"]
    terminal, tval = pend["terminal"], pend["tval"]
    parent, action = pend["parent"], pend["action"]
    do_expand = (alloc > 0) & (terminal == 0)
    # expansion: new node's edge row = 1 (no child) + quantized prior;
    # illegal actions = 0
    new_row = jnp.where(do_expand & (pend["valid"] > 0),
                        1.0 + _qfrac(probs), 0.0)             # (A, B)
    pc_s[:, pl.ds(slot, 1), :] = new_row[:, None, :]
    ohp = (_iota(Nc, B) == jnp.where(alloc > 0, parent, Nc)) \
        .astype(jnp.float32)
    oha = (_iota(A, B) == action).astype(jnp.float32)
    edge = ohp[None] * oha[:, None, :]
    # allocation edges hold exactly 1 + frac (chsel < 0 <=> integer part
    # 1), so += edge*(slot+1) produces (slot+2) + frac BITWISE (both
    # addends multiples of 2^-15 < 512; frac preserved) — one FMA pass
    # instead of floor/sub/select
    pc_s[:, 0:Nc, :] = (pc_s[:, 0:Nc, :]
                        + edge * (slot.astype(jnp.float32) + 1.0))

    if rc is not None and len(rc) >= 5:
        # ---- d1 mirror maintenance (pc1 edge rows of depth-1 nodes
        # keyed by root action a0; see _update_d1_cache)
        pc1 = rc[2]
        a0 = apath_s[pl.ds(0, 1), :]                          # (1, B)
        a0_oh = (_iota(A, B) == a0).astype(jnp.float32)
        # expansion AT depth 1: the new node IS a root child — copy its
        # whole edge row into pc1[:, a0]
        d1x = (do_expand & (depth == 1)).astype(jnp.float32)
        m_row = a0_oh[None] * d1x[None]                       # (1, A, B)
        pc1_w = jnp.where(m_row > 0, new_row[:, None, :], pc1[:])
        # allocation at depth 2: the parent (a depth-1 node) edge
        # (a1 = action) now points at the slot — same exact += (slot+1)
        d2a = ((alloc > 0) & (depth == 2)).astype(jnp.float32)
        m_edge = oha[:, None, :] * a0_oh[None] * d2a[None]
        pc1[:] = pc1_w + m_edge * (slot.astype(jnp.float32) + 1.0)

    if rc is not None and len(rc) == 8:
        # ---- d2 mirror maintenance (pc2 edge rows of depth-2 nodes
        # keyed k = a1*A + a0; see _update_d2_cache)
        pc2 = rc[5]
        a1p = apath_s[pl.ds(1, 1), :]                         # (1, B)
        # expansion AT depth 2: the new node IS a depth-2 node (reached
        # by edge a1 = action from root child a0) — copy its edge row
        # into pc2[:, action*A + a0]
        d2x = (do_expand & (depth == 2))
        ohx = (_iota(A * A, B) == (action * A + a0)) & d2x
        m_row2 = ohx.astype(jnp.float32)                      # (A^2, B)
        pc2_w = jnp.where(m_row2[None] > 0, new_row[:, None, :], pc2[:])
        # allocation at depth 3: the parent (a depth-2 node keyed
        # k = apath[1]*A + a0) edge a2 = action now points at the slot
        d3a = ((alloc > 0) & (depth == 3))
        ohp2 = (_iota(A * A, B) == (a1p * A + a0)) & d3a
        m_edge2 = oha[:, None, :] * ohp2.astype(jnp.float32)[None]
        pc2[:] = pc2_w + m_edge2 * (slot.astype(jnp.float32) + 1.0)

    # ---- backup (ai/node.py:62-74 semantics); the leaf ply adds
    # 1 + 0.5*expand into the enc array, interior plies add 1
    leaf_value = jnp.where(terminal > 0, tval, -value)
    dmax = jnp.max(depth)

    def bk(c):
        d, visit, val = c
        nd = path_s[pl.ds(jnp.minimum(d, dcap - 1), 1), :]
        nd = jnp.where(d == depth, leaf, nd)
        am = (d <= depth).astype(jnp.float32)
        sign = jnp.where((depth - d) % 2 == 0, 1.0, -1.0)
        oh = (_iota(Nc, B) == nd).astype(jnp.float32) * am
        inc = 1.0 + jnp.where((d == depth) & do_expand, 0.5, 0.0)
        return d + 1, visit + oh * inc, val + oh * (sign * leaf_value)

    # 2x unroll — loop control dominates; overrun plies mask to 0
    bku = _env_knob("AZ_BK_UNROLL", 2, cfg.backup_unroll if cfg else None)

    def nbk(c):
        for _ in range(bku):
            c = bk(c)
        return c

    d_start = 4 if (rc is not None and len(rc) == 8) else 0
    _, visit, val = jax.lax.while_loop(
        lambda c: c[0] <= dmax, nbk,
        (d_start, visit_s[0:Nc, :], val_s[0:Nc, :]))
    visit_s[0:Nc, :] = visit
    val_s[0:Nc, :] = val
    if d_start == 4:
        # ply 0 through the ref as a static row-1 slice (Mosaic lowers
        # neither scatter-add nor value-level dynamic_update_slice);
        # path rows are disjoint, so ordering after the write-back is
        # bitwise-identical
        sign0 = jnp.where(depth % 2 == 0, 1.0, -1.0)
        visit_s[0:1, :] = visit_s[0:1, :] + 1.0
        val_s[0:1, :] = val_s[0:1, :] + sign0 * leaf_value
    if rc is not None:
        _update_root_cache(A, B, rc[0], rc[1], apath_s[pl.ds(0, 1), :],
                           depth, do_expand, leaf_value)
        if len(rc) >= 5:
            _update_d1_cache(A, B, rc[3], rc[4],
                             apath_s[pl.ds(0, 1), :],
                             apath_s[pl.ds(1, 1), :], depth,
                             do_expand, leaf_value)
        if len(rc) == 8:
            _update_d2_cache(A, B, rc[6], rc[7],
                             apath_s[pl.ds(0, 1), :],
                             apath_s[pl.ds(1, 1), :],
                             apath_s[pl.ds(2, 1), :], depth,
                             do_expand, leaf_value)


def _run_move_sims_2x(env, cfg: MCTSConfig, model, dcap: int, wrefs,
                      W_ref, aux_ref, halves):
    """Simulations 1..S-1 pipelined over TWO independent half-batches.

    The dense forward (MXU) of one half executes under the descend/backup
    (VPU) of the OTHER half — measured on v5e, Mosaic overlaps MXU matmuls
    with independent VPU chains perfectly (scripts/prof_overlap.py), so a
    move costs ~max(VPU, MXU) instead of their sum.  Per half the schedule
    is exactly sequential MCTS — results are bitwise-identical to
    _run_move_sims on each half's lanes.

    ``halves``: two 9-tuples (get_board, rootp, rootmc, visit_s, val_s,
    pc_s, path_s, apath_s, rc), one per half-batch — enc-coded visit,
    packed prior+children edges, and the half's mirror tuple (same
    2/5/8-length convention as _run_move_sims — with the full set each
    half gets the d0/d1/d2 peels and the dead-row backup).
    """
    S = cfg.num_simulations
    N = halves[0][3].shape[0]

    def dl(h, Nc, slot):
        (get_board, rootp, rootmc, visit_s, val_s, pc_s,
         path_s, apath_s, rc) = halves[h]
        return _descend_leaf(env, cfg, model, dcap, W_ref, aux_ref,
                             get_board, rootp, rootmc, visit_s, val_s,
                             pc_s, path_s, apath_s, Nc, slot, rc=rc)

    def ap(h, Nc, slot, pend, probs, value):
        (_, _, _, visit_s, val_s, pc_s, path_s, apath_s, rc) = halves[h]
        _apply_sim(env, cfg, dcap, visit_s, val_s, pc_s, path_s, apath_s,
                   Nc, slot, pend, probs, value, rc=rc)

    def fwd(obs):
        return _leaf_eval(env, model, wrefs, obs, W_ref[:], cfg)

    # ---- prologue: slot 1 descends; half0's forward issues first
    n_seg = _env_knob("AZ_NSEG", 4 if S >= 128 else (2 if S >= 64 else 1),
                      cfg.nseg)
    n_seg = min(n_seg, max(S, 1))   # degenerate-segment guard (see
    hi1 = max(1, -(-S) // n_seg)    # _run_move_sims' note)
    Nc0 = min(N, -(-hi1 // 8) * 8)
    pend0 = dl(0, Nc0, jnp.int32(1))
    f0 = fwd(pend0["obs"])
    pend1 = dl(1, Nc0, jnp.int32(1))

    carry = (f0[0], f0[1], pend0, pend1)
    lo = 1
    for k in range(1, n_seg + 1):
        hi = min(S, -(-S * k) // n_seg)
        if hi <= lo:
            continue
        Nc = min(N, -(-hi // 8) * 8)

        def body(s, carry, Nc=Nc):
            f0p, f0v, pend0, pend1 = carry
            f1p, f1v = fwd(pend1["obs"])           # MXU (hides under ap0/dl0)
            ap(0, Nc, s, pend0, f0p, f0v)
            pend0n = dl(0, Nc, s + 1)
            f0np, f0nv = fwd(pend0n["obs"])        # MXU (hides under ap1/dl1)
            ap(1, Nc, s, pend1, f1p, f1v)
            pend1n = dl(1, Nc, s + 1)
            return f0np, f0nv, pend0n, pend1n

        carry = jax.lax.fori_loop(lo, hi, body, carry)
        lo = hi

    # ---- epilogue: the trailing slot-S descends were wasted work (slot S
    # is never applied; N = S + 1 rows keep them in range).  Nothing to do.
    del carry


def _root_counts(env, visit_s, pc_s, val_s, rcv=None):
    """Root visit counts (A, B) and root Q (1, B) from the tree arrays.
    ``visit_s`` is enc-coded (visit + 0.5·expanded): floor decodes;
    ``pc_s`` is packed (child_id+2)+prior_frac.  With ``rcv`` (the (A, B)
    root-child visit mirror) the counts are a single floor/mask instead of
    the per-action one-hot gather loop."""
    A = env.action_dim
    N, B = visit_s.shape
    visit = visit_s[:]
    crow = jnp.floor(pc_s[:, 0, :]) - 2.0                      # (A, B)
    if rcv is not None:
        counts = jnp.where(crow >= 0, jnp.floor(rcv[:]), 0.0)
    else:
        cnt = []
        for a in range(A):
            oh = (_iota(N, B) == crow[a:a + 1, :].astype(jnp.int32)) \
                .astype(jnp.float32)
            cnt.append(jnp.sum(visit * oh, axis=0, keepdims=True))
        counts = jnp.where(crow >= 0,
                           jnp.floor(jnp.concatenate(cnt, axis=0)), 0.0)
    rootq = val_s[0:1, :] / jnp.maximum(jnp.floor(visit[0:1, :]), 1.0)
    return counts, rootq


def _move_kernel(env, cfg: MCTSConfig, dcap: int, model, n_w: int,
                 *refs):
    """One whole move: simulations 1..S-1 with the network inside.

    refs layout:
      inputs:  board (2, RC, B), player (1, B), mc (1, B),
               root_prior (A, B), root_v (1, B), live (1, B),
               W (RC, L), aux, then n_w weight arrays
      outputs: counts (A, B) f32, rootq (1, B) f32
      scratch: visit (enc) / val (N, B), prior (A, N, B),
               children (A, N, B), path (dcap, B) i32, apath (dcap, B) i32
    """
    (board_ref, player_ref, mc_ref, rprior_ref, rv_ref, live_ref,
     W_ref, aux_ref) = refs[:8]
    wrefs = refs[8:8 + n_w]
    counts_ref, rootq_ref = refs[8 + n_w:10 + n_w]
    scratch = refs[10 + n_w:]
    (visit_s, val_s, pc_s, path_s, apath_s, rcv_s, rcq_s) = scratch[:7]
    d1 = len(scratch) >= 10
    d2 = len(scratch) == 13
    if d1:
        pc1_s, rcv1_s, rcq1_s = scratch[7:10]
    if d2:
        pc2_s, rcv2_s, rcq2_s = scratch[10:]

    A = env.action_dim
    N = visit_s.shape[0]
    B = visit_s.shape[1]
    rootp = player_ref[:]
    rootmc = mc_ref[:]
    live = live_ref[:]

    # ---- root expansion (host-computed prior/value; ai/mcts.py:34-56).
    # visit is enc-coded: root = 1 visit + 0.5 if expanded (live games).
    # Edges are packed (child+2)+prior_frac: legal root actions (host
    # marks illegal/dead with NEG) start with no child (integer 1).
    visit_s[:] = jnp.zeros((N, B), jnp.float32)
    val_s[:] = jnp.zeros((N, B), jnp.float32)
    visit_s[0:1, :] = 1.0 + 0.5 * (live > 0).astype(jnp.float32)
    val_s[0:1, :] = jnp.where(live > 0, -rv_ref[:], 0.0)
    rp = rprior_ref[:]
    pc_s[:] = jnp.zeros((A, N, B), jnp.float32)
    pc_s[:, 0, :] = jnp.where(rp > -1e29, 1.0 + _qfrac(rp), 0.0)
    rcv_s[:] = jnp.zeros((A, B), jnp.float32)
    rcq_s[:] = jnp.zeros((A, B), jnp.float32)
    rc = (rcv_s, rcq_s)
    if d1:
        pc1_s[:] = jnp.zeros((A, A, B), jnp.float32)
        rcv1_s[:] = jnp.zeros((A, A, B), jnp.float32)
        rcq1_s[:] = jnp.zeros((A, A, B), jnp.float32)
        rc = rc + (pc1_s, rcv1_s, rcq1_s)
    if d2:
        pc2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
        rcv2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
        rcq2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
        rc = rc + (pc2_s, rcv2_s, rcq2_s)

    def get_board():
        return (board_ref[0, :, :].astype(jnp.float32),
                board_ref[1, :, :].astype(jnp.float32))

    _run_move_sims(env, cfg, model, dcap, wrefs, W_ref, aux_ref, get_board,
                   rootp, rootmc, visit_s, val_s, pc_s, path_s, apath_s,
                   rc=rc)

    counts, rootq = _root_counts(env, visit_s, pc_s, val_s, rcv=rcv_s)
    counts_ref[:] = counts
    rootq_ref[:] = rootq


# --------------------------------------------------------------------------
# multi-move self-play kernel: M whole moves per pallas_call
# --------------------------------------------------------------------------
#
# The single-move kernel still pays, per move, an XLA root forward +
# Dirichlet prep, input transposes, kernel launch, tree-scratch init, and
# the action-selection / env-step / trajectory glue ops between launches.
# This kernel runs M complete self-play moves back-to-back on-core:
#
#   for m in 0..M-1:  root obs → dense forward → Dirichlet mix (noise
#   precomputed host-side: jax.random.dirichlet has no in-kernel
#   equivalent) → tree init → S-1 simulations → visit counts → action
#   (visit-sampled below temperature_moves via inverse-CDF on a supplied
#   uniform, argmax after; gomoku.py:144) → env step (gravity, win matmul)
#   → record (obs, π, player, t, action, done, winner, root Q) → auto-reset
#   finished games.
#
# Only the per-move RECORDS leave the chip; the surrounding runner folds
# them into trajectory slabs / replay flushes once per chunk
# (training/selfplay.py).  Semantics per move are identical to
# run_mcts_fused except the root evaluation runs in-kernel (same bf16
# matmul class as the flax forward) and action sampling uses inverse-CDF
# on uniforms instead of jax.random.categorical (same distribution).


def supports_selfplay_fused(env, batch: int, cfg: MCTSConfig, model,
                            replay_augment_ok: bool = True,
                            interpret: bool = False) -> bool:
    """Multi-move kernel applies under the same conditions as the
    single-move kernel plus Dirichlet root noise enabled-or-disabled
    uniformly (it is a static flag in-kernel).  ``AZ_DISABLE_CHUNK=1``
    forces the per-move path (A/B timing, fallback).

    ``interpret=True`` (CPU-mesh tests/dryruns, where interpret mode
    stands in for Mosaic) applies only the SEMANTIC gates — family,
    sequential mode, the packed-edge precision bound, the kill switch —
    and relaxes the VMEM/platform checks.  This is the single source of
    those gates (parallel/spmd.py dispatches through it)."""
    import os
    from alphazero_tpu.models.dense import DenseTower
    if os.environ.get("AZ_DISABLE_CHUNK"):
        return False
    if interpret:
        return (isinstance(model, DenseTower) and cfg.leaf_batch == 1
                and cfg.num_simulations + 2 < 512)
    return supports_fused(env, batch, cfg, model)


def _sample_from_counts(cfg: MCTSConfig, counts, policy, u, t):
    """Action per game (1, B) i32: visit-sampled while ``t`` <
    ``temperature_moves`` (inverse-CDF on ``u`` ∈ [0,1)), argmax after —
    gomoku.py:144 / training/selfplay.py semantics."""
    A, B = counts.shape
    ids = _iota(A, B)
    greedy = _argmax_first(counts, A, B)
    # inverse CDF, unrolled over the small action dim (Mosaic-safe cumsum)
    rows, acc = [], jnp.zeros((1, B), jnp.float32)
    for a in range(A):
        acc = acc + policy[a:a + 1, :]
        rows.append(acc)
    cum = jnp.concatenate(rows, axis=0)                    # (A, B)
    cand = jnp.where(cum > u, ids, A)
    sampled = jnp.min(cand, axis=0, keepdims=True)
    # float-edge fallback (cum[-1] < u by rounding): last visited action;
    # if NO action has visits (possible only at num_simulations <= 1,
    # last_visited = -1) fall back to greedy so the kernel never plays an
    # out-of-range action that would desync board and move count.
    last_visited = jnp.max(jnp.where(counts > 0, ids, -1), axis=0,
                           keepdims=True)
    fallback = jnp.where(last_visited >= 0, last_visited, greedy)
    sampled = jnp.where(sampled >= A, fallback, sampled)
    return jnp.where(t < cfg.temperature_moves, sampled, greedy)


def _chunk_kernel(env, cfg: MCTSConfig, dcap: int, model, n_w: int, M: int,
                  pipelined: bool, *refs):
    """M whole self-play moves for all B games.

    refs layout:
      inputs:  board (2, RC, B) f32, player (1, B) i32, mc (1, B) i32,
               noise (M·Ap, B) f32, unif (M·8, B) f32, W (RC, L), aux,
               then n_w weight arrays
      outputs: board/player/mc (aliased in place),
               rec_obs (M·ORCp, B) f32, rec_policy (M·Ap, B) f32,
               rec_meta (M·8, B) f32 rows per move:
                 [player, t_pre, action, done, winner, root_q, 0, 0]
      scratch (pipelined=False): visit (enc) / val (N, B),
               prior (A, N, B), children (A, N, B), path/apath (dcap, B)
      scratch (pipelined=True): the same arrays split into two lane halves
               (N, H) / (A, N, H) / (dcap, H), interleaved per half —
               the sim loop runs the two halves MXU/VPU-pipelined
               (_run_move_sims_2x).
    """
    (board_in, player_in, mc_in, noise_ref, unif_ref, W_ref,
     aux_ref) = refs[:7]
    wrefs = refs[7:7 + n_w]
    (board_ref, player_ref, mc_ref, obs_out, pol_out,
     meta_out) = refs[7 + n_w:13 + n_w]
    scratch = refs[13 + n_w:]
    if pipelined:
        (visit0, visit1, val0, val1, pc0, pc1,
         path0, path1, apath0, apath1,
         rcv0, rcv1, rcq0, rcq1) = scratch[:14]
        d1p = len(scratch) >= 20
        d2p = len(scratch) == 26
        if d1p:
            (pm1_0, pm1_1, rv1_0, rv1_1, rq1_0, rq1_1) = scratch[14:20]
        if d2p:
            (pm2_0, pm2_1, rv2_0, rv2_1, rq2_0, rq2_1) = scratch[20:]
    else:
        (visit_s, val_s, pc_s, path_s, apath_s, rcv_s, rcq_s) = scratch[:7]
        d1 = len(scratch) >= 10
        d2 = len(scratch) == 13
        if d1:
            pc1_s, rcv1_s, rcq1_s = scratch[7:10]
        if d2:
            pc2_s, rcv2_s, rcq2_s = scratch[10:]

    A = env.action_dim
    RC = env.rows * env.cols
    R, C = env.rows, env.cols
    F = env.feature_dim
    N = scratch[0].shape[0]
    B = board_in.shape[2]
    H = B // 2
    Ap = _pad8_local(A)
    ORCp = _pad8_local(F * RC)
    eps = jnp.float32(cfg.dirichlet_eps)

    def move(m, _):
        p0 = board_ref[0, :, :]                                # (RC, B) f32
        p1 = board_ref[1, :, :]
        player = player_ref[:]                                 # (1, B) i32
        mc = mc_ref[:]

        # ---- canonical root observation (envs/core.py observation)
        is0 = (player == 0).astype(jnp.float32)
        mine = p0 * is0 + p1 * (1.0 - is0)
        theirs = p1 * is0 + p0 * (1.0 - is0)
        if F == 3:
            tomove = jnp.broadcast_to(player.astype(jnp.float32), (RC, B))
            obs = jnp.concatenate([mine, theirs, tomove], axis=0)
        else:
            obs = jnp.concatenate([mine, theirs], axis=0)

        # ---- root evaluation + Dirichlet mix (ai/mcts.py:34-53)
        probs0, value0 = _leaf_eval(env, model, wrefs, obs, W_ref[:], cfg)
        if cfg.use_dirichlet:
            nz = noise_ref[pl.ds(m * Ap, A), :]
            probs0 = (1.0 - eps) * probs0 + eps * nz

        # ---- legal mask at the root
        occ = p0 + p1
        if env.name == "connect4":
            heights = jnp.dot(aux_ref[:], occ,
                              preferred_element_type=jnp.float32)  # (C, B)
            valid = (heights < R).astype(jnp.float32)
        elif env.name.startswith("gomoku"):
            near = jnp.dot(aux_ref[:], occ,
                           preferred_element_type=jnp.float32)
            empty = (occ == 0).astype(jnp.float32)
            center = (_iota(RC, B) == (R // 2) * C + C // 2) \
                .astype(jnp.float32)
            any_st = jnp.max(occ, axis=0, keepdims=True)
            valid = jnp.where(any_st > 0,
                              (near > 0).astype(jnp.float32) * empty, center)
        else:
            valid = (occ == 0).astype(jnp.float32)

        # ---- tree init (root expansion; every game is live in-kernel —
        # finished games were reset at the end of the previous move).
        # visit is enc-coded: root = 1 visit + 0.5 expanded.
        root_pc = jnp.where(valid > 0, 1.0 + _qfrac(probs0), 0.0)
        if pipelined:
            import os as _os
            halves = []
            hmirrors = [(), ()]
            if d1p:
                hmirrors = [(pm1_0, rv1_0, rq1_0), (pm1_1, rv1_1, rq1_1)]
            if d2p:
                hmirrors = [hmirrors[0] + (pm2_0, rv2_0, rq2_0),
                            hmirrors[1] + (pm2_1, rv2_1, rq2_1)]
            for h, (v_s, l_s, p_s, pa_s, ap_s, rv_s, rq_s) in enumerate(
                    [(visit0, val0, pc0, path0, apath0, rcv0, rcq0),
                     (visit1, val1, pc1, path1, apath1, rcv1, rcq1)]):
                sl = slice(h * H, (h + 1) * H)
                v_s[:] = jnp.zeros((N, H), jnp.float32)
                l_s[:] = jnp.zeros((N, H), jnp.float32)
                v_s[0:1, :] = jnp.full((1, H), 1.5, jnp.float32)
                l_s[0:1, :] = -value0[:, sl]
                p_s[:] = jnp.zeros((A, N, H), jnp.float32)
                p_s[:, 0, :] = root_pc[:, sl]
                rv_s[:] = jnp.zeros((A, H), jnp.float32)
                rq_s[:] = jnp.zeros((A, H), jnp.float32)
                for mref in hmirrors[h]:
                    mref[:] = jnp.zeros(mref.shape, jnp.float32)
                rc_h = (rv_s, rq_s) + hmirrors[h]
                if _os.environ.get("AZ_NO_D1"):
                    rc_h = rc_h[:2]
                elif _os.environ.get("AZ_NO_D2"):
                    rc_h = rc_h[:5]
                if dcap <= 2:
                    rc_h = rc_h[:2]    # see _run_move_sims' dcap gates
                elif dcap <= 3:
                    rc_h = rc_h[:5]
                halves.append((
                    (lambda s=sl: (p0[:, s], p1[:, s])),
                    player[:, sl], mc[:, sl],
                    v_s, l_s, p_s, pa_s, ap_s, rc_h))
            _run_move_sims_2x(env, cfg, model, dcap, wrefs, W_ref,
                              aux_ref, halves)
            c0, q0 = _root_counts(env, visit0, pc0, val0, rcv=rcv0)
            c1, q1 = _root_counts(env, visit1, pc1, val1, rcv=rcv1)
            counts = jnp.concatenate([c0, c1], axis=1)
            rootq = jnp.concatenate([q0, q1], axis=1)
        else:
            visit_s[:] = jnp.zeros((N, B), jnp.float32)
            val_s[:] = jnp.zeros((N, B), jnp.float32)
            visit_s[0:1, :] = jnp.full((1, B), 1.5, jnp.float32)
            val_s[0:1, :] = -value0
            pc_s[:] = jnp.zeros((A, N, B), jnp.float32)
            pc_s[:, 0, :] = root_pc
            rcv_s[:] = jnp.zeros((A, B), jnp.float32)
            rcq_s[:] = jnp.zeros((A, B), jnp.float32)
            rc = (rcv_s, rcq_s)
            if d1:
                pc1_s[:] = jnp.zeros((A, A, B), jnp.float32)
                rcv1_s[:] = jnp.zeros((A, A, B), jnp.float32)
                rcq1_s[:] = jnp.zeros((A, A, B), jnp.float32)
                rc = rc + (pc1_s, rcv1_s, rcq1_s)
            if d2:
                pc2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
                rcv2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
                rcq2_s[:] = jnp.zeros((A, A * A, B), jnp.float32)
                rc = rc + (pc2_s, rcv2_s, rcq2_s)

            _run_move_sims(env, cfg, model, dcap, wrefs, W_ref, aux_ref,
                           lambda: (p0, p1), player, mc, visit_s, val_s,
                           pc_s, path_s, apath_s, rc=rc)

            counts, rootq = _root_counts(env, visit_s, pc_s, val_s,
                                         rcv=rcv_s)
        total = jnp.maximum(jnp.sum(counts, axis=0, keepdims=True), 1.0)
        policy = counts / total

        # ---- action selection
        u = unif_ref[pl.ds(m * 8, 1), :]                       # (1, B)
        action = _sample_from_counts(cfg, counts, policy, u, mc)

        # ---- record BEFORE stepping (train.py:37, gomoku.py:138-140)
        obs_out[pl.ds(m * ORCp, F * RC), :] = obs
        pol_out[pl.ds(m * Ap, A), :] = policy

        # ---- env step (envs/core.py:step semantics)
        if env.name == "connect4":
            col_oh = (_iota(C, B) == action).astype(jnp.float32)
            h = jnp.sum(heights * col_oh, axis=0, keepdims=True)
            cell = (R - 1 - h.astype(jnp.int32)) * C + action
        else:
            cell = action
        cell_oh = (_iota(RC, B) == cell).astype(jnp.float32)
        p0n = p0 + cell_oh * is0
        p1n = p1 + cell_oh * (1.0 - is0)
        mover_plane = p0n * is0 + p1n * (1.0 - is0)
        linesum = jnp.dot(W_ref[:].T, mover_plane,
                          preferred_element_type=jnp.float32)
        won = (jnp.max(linesum, axis=0, keepdims=True)
               >= env.win_len).astype(jnp.float32)
        mc1 = mc + 1
        done = jnp.maximum(won, (mc1 >= env.max_moves).astype(jnp.float32))
        winner = jnp.where(won > 0, player.astype(jnp.float32), -1.0)

        meta_out[pl.ds(m * 8, 8), :] = jnp.concatenate([
            player.astype(jnp.float32),
            mc.astype(jnp.float32),
            action.astype(jnp.float32),
            done,
            winner,
            rootq,
            jnp.zeros((2, B), jnp.float32),
        ], axis=0)

        # ---- auto-reset finished games, else advance
        keep = 1.0 - done
        board_ref[0, :, :] = p0n * keep
        board_ref[1, :, :] = p1n * keep
        player_ref[:] = jnp.where(done > 0, 0, 1 - player)
        mc_ref[:] = jnp.where(done > 0, 0, mc1)
        return 0

    # copy live state into the aliased outputs once, then loop moves
    board_ref[:] = board_in[:]
    player_ref[:] = player_in[:]
    mc_ref[:] = mc_in[:]
    jax.lax.fori_loop(0, M, move, 0)


def _pad8_local(n: int) -> int:
    return -(-n // 8) * 8


def run_selfplay_chunk_fused(env, model, params, boards, players,
                             move_counts, rng, cfg: MCTSConfig, M: int,
                             interpret: bool = False,
                             pipelined=None):
    """Run M fused self-play moves for all B games.

    Inputs are raw env state arrays (``boards (B, 2, R, C)`` int8,
    ``players/move_counts (B,)``); all games must be LIVE (auto-reset
    happens in-kernel).  Returns a dict of per-move records (move-major)::

      obs (M, B, F, R, C) int8   canonical observation before the move
      policy (M, B, A) f32       root visit distribution
      player (M, B) i32          player to move
      t (M, B) i32               move index within the game
      action (M, B) i32          action taken
      done (M, B) bool           game finished on this move
      winner (M, B) i32          0/1 winner or -1 (valid where done)
      root_q (M, B) f32
      board/player/mc            final state after M moves (resets applied)
    """
    B = boards.shape[0]
    A = env.action_dim
    RC = env.rows * env.cols
    F = env.feature_dim
    N = cfg.num_simulations + 1
    dcap = int(min(env.max_moves + 1, cfg.num_simulations + 1))
    Ap = _pad8_local(A)
    ORCp = _pad8_local(F * RC)

    rng_n, rng_u = jax.random.split(rng)
    # Dirichlet directly in kernel layout: iid Gamma(α) over the ACTION
    # axis normalized per (move, game) — the same construction
    # jax.random.dirichlet uses, drawn straight into (M, A, B) so no
    # lane↔sublane transpose or pad-scatter is needed (distribution
    # identical; draw values differ from the dirichlet() axis order)
    g = jax.random.gamma(rng_n, jnp.float32(cfg.dirichlet_alpha),
                         shape=(M, A, B))
    noise = g / jnp.sum(g, axis=1, keepdims=True)
    noise_t = jnp.concatenate(
        [noise, jnp.zeros((M, Ap - A, B), jnp.float32)],
        axis=1).reshape(M * Ap, B) if Ap > A else noise.reshape(M * Ap, B)
    # the kernel reads only row m·8 of each 8-row block; surplus rows are
    # cheaper to draw than to pad-scatter
    unif_t = jax.random.uniform(rng_u, (M * 8, B), jnp.float32)

    tables = _game_tables(env)
    W = jnp.asarray(tables["W"])
    aux = jnp.asarray(tables["aux"])
    ws = _pack_dense_params(model, params)
    n_w = len(ws)

    board_t = boards.astype(jnp.float32).reshape(B, 2, RC).transpose(1, 2, 0)
    player_t = players.astype(jnp.int32).reshape(1, B)
    mc_t = move_counts.astype(jnp.int32).reshape(1, B)

    # MXU/VPU pipelining over two half-batches needs 128-lane halves
    if pipelined is None:
        import os as _os
        if _os.environ.get("AZ_NO_PIPE"):
            pipelined = False
        elif _os.environ.get("AZ_PIPE"):
            pipelined = True
        else:
            # DEFAULT ON for two ≥128-lane halves (round 5): with the
            # d0/d1/d2 peels + dead-row backup the exposed forward is
            # ~1.1 of ~5.9 ms/move, and hiding it under the other half's
            # VPU work measured 5.88 → 5.67 ms/move (with nseg=8: 5.48 =
            # 93.4k env-steps/s, carried state).  Round 4 measured ~0
            # gain at its forward≈search balance — the mirrors changed
            # the answer.  AZ_PIPE/AZ_NO_PIPE force either way.
            pipelined = B % 256 == 0
        # the forward-level stage interleave (_dense_forward_2x) captures
        # the MXU/VPU overlap without per-half trees
    H = B // 2
    if pipelined:
        scratch = []
        for _ in range(2):
            scratch += [pltpu.VMEM((N, H), jnp.float32)]   # visit (enc)
        for _ in range(2):
            scratch += [pltpu.VMEM((N, H), jnp.float32)]   # val
        for _ in range(2):
            scratch += [pltpu.VMEM((A, N, H), jnp.float32)]  # packed edges
        for _ in range(2):
            scratch += [pltpu.VMEM((dcap, H), jnp.int32)]  # path
        for _ in range(2):
            scratch += [pltpu.VMEM((dcap, H), jnp.int32)]  # apath
        for _ in range(2):
            scratch += [pltpu.VMEM((A, H), jnp.float32)]   # root cvisit
        for _ in range(2):
            scratch += [pltpu.VMEM((A, H), jnp.float32)]   # root cval
        if _use_d1(env):
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A, H), jnp.float32)]  # d1 edge
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A, H), jnp.float32)]  # d1 cvis
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A, H), jnp.float32)]  # d1 cval
        if _use_d2(env):
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A * A, H), jnp.float32)]
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A * A, H), jnp.float32)]
            for _ in range(2):
                scratch += [pltpu.VMEM((A, A * A, H), jnp.float32)]
    else:
        scratch = [
            pltpu.VMEM((N, B), jnp.float32),             # visit (enc)
            pltpu.VMEM((N, B), jnp.float32),             # val
            pltpu.VMEM((A, N, B), jnp.float32),          # packed edges
            pltpu.VMEM((dcap, B), jnp.int32),            # path
            pltpu.VMEM((dcap, B), jnp.int32),            # apath
            pltpu.VMEM((A, B), jnp.float32),             # root cvisit
            pltpu.VMEM((A, B), jnp.float32),             # root cval
        ]
        if _use_d1(env):
            scratch += [
                pltpu.VMEM((A, A, B), jnp.float32),      # d1 edge rows
                pltpu.VMEM((A, A, B), jnp.float32),      # d1 cvisit (enc)
                pltpu.VMEM((A, A, B), jnp.float32),      # d1 cval
            ]
        if _use_d2(env):
            scratch += [
                pltpu.VMEM((A, A * A, B), jnp.float32),  # d2 edge rows
                pltpu.VMEM((A, A * A, B), jnp.float32),  # d2 cvisit (enc)
                pltpu.VMEM((A, A * A, B), jnp.float32),  # d2 cval
            ]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = pl.pallas_call(
        functools.partial(_chunk_kernel, env, cfg, dcap, model, n_w, M,
                          pipelined),
        out_shape=(
            jax.ShapeDtypeStruct((2, RC, B), jnp.float32),   # board
            jax.ShapeDtypeStruct((1, B), jnp.int32),         # player
            jax.ShapeDtypeStruct((1, B), jnp.int32),         # mc
            jax.ShapeDtypeStruct((M * ORCp, B), jnp.float32),  # obs
            jax.ShapeDtypeStruct((M * Ap, B), jnp.float32),  # policy
            jax.ShapeDtypeStruct((M * 8, B), jnp.float32),   # meta
        ),
        in_specs=[vspec] * (7 + n_w),
        out_specs=(vspec,) * 6,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    board_o, player_o, mc_o, obs_o, pol_o, meta_o = kern(
        board_t, player_t, mc_t, noise_t, unif_t, W, aux, *ws)

    # lane↔sublane transposes via identity matmul: XLA's native transpose
    # of these shapes runs ~3 GB/s on TPU; an einsum against I runs on the
    # MXU (exact — single 0/1 coefficient per output element)
    def t_mxu(x3):  # (M', R, B) -> (M', B, R)
        eye = jnp.eye(x3.shape[1], dtype=jnp.float32)
        # HIGHEST = 3-pass bf16: exact for f32·{0,1} (default single-pass
        # bf16 rounds the mantissa — measured 0.1% policy corruption)
        return jnp.einsum("mrb,rc->mbc", x3, eye,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    # slice off the unwritten pad rows BEFORE contracting (0·garbage = NaN)
    obs_m = t_mxu(obs_o.reshape(M, ORCp, B)[:, :F * RC]) \
        .reshape(M, B, F, env.rows, env.cols).astype(jnp.int8)
    pol_m = t_mxu(pol_o.reshape(M, Ap, B)[:, :A])          # (M, B, A)
    meta = meta_o.reshape(M, 8, B)
    board_f = (t_mxu(board_o) > 0.5).transpose(1, 0, 2).reshape(
        B, 2, env.rows, env.cols).astype(jnp.int8)
    return {
        "obs": obs_m,
        "policy": pol_m,
        "player": meta[:, 0].astype(jnp.int32),
        "t": meta[:, 1].astype(jnp.int32),
        "action": meta[:, 2].astype(jnp.int32),
        "done": meta[:, 3] > 0,
        "winner": meta[:, 4].astype(jnp.int32),
        "root_q": meta[:, 5],
        "board": board_f,
        "player_final": player_o.reshape(B),
        "mc_final": mc_o.reshape(B),
    }


def run_mcts_fused(env, model, params, eval_fn, boards, players,
                   move_counts, dones, rng, cfg: MCTSConfig,
                   use_dirichlet=None, interpret: bool = False):
    """Whole-move fused search; same semantics/returns as run_mcts.

    ``eval_fn`` (the flax forward) is used for the ROOT evaluation only —
    one XLA forward, bitwise-identical root priors across engines."""
    from alphazero_tpu.search.mcts import SearchResult, _prep_priors

    B = boards.shape[0]
    A = env.action_dim
    RC = env.rows * env.cols
    N = cfg.num_simulations + 1
    if use_dirichlet is None:
        use_dirichlet = jnp.full((B,), cfg.use_dirichlet)
    dcap = int(min(env.max_moves + 1, cfg.num_simulations + 1))

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

    tables = _game_tables(env)
    W = jnp.asarray(tables["W"])
    aux = jnp.asarray(tables["aux"])
    ws = _pack_dense_params(model, params)
    n_w = len(ws)

    board_t = boards.astype(jnp.float32).reshape(B, 2, RC).transpose(1, 2, 0)
    player_t = players.astype(jnp.int32).reshape(1, B)
    mc_t = move_counts.astype(jnp.int32).reshape(1, B)
    live_t = live.astype(jnp.float32).reshape(1, B)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = pl.pallas_call(
        functools.partial(_move_kernel, env, cfg, dcap, model, n_w),
        out_shape=(
            jax.ShapeDtypeStruct((A, B), jnp.float32),   # counts
            jax.ShapeDtypeStruct((1, B), jnp.float32),   # root q
        ),
        in_specs=[vspec] * (8 + n_w),
        out_specs=(vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((N, B), jnp.float32),             # visit (enc)
            pltpu.VMEM((N, B), jnp.float32),             # val
            pltpu.VMEM((A, N, B), jnp.float32),          # packed edges
            pltpu.VMEM((dcap, B), jnp.int32),            # path
            pltpu.VMEM((dcap, B), jnp.int32),            # apath
            pltpu.VMEM((A, B), jnp.float32),             # root cvisit
            pltpu.VMEM((A, B), jnp.float32),             # root cval
        ] + ([
            pltpu.VMEM((A, A, B), jnp.float32),          # d1 edge rows
            pltpu.VMEM((A, A, B), jnp.float32),          # d1 cvisit (enc)
            pltpu.VMEM((A, A, B), jnp.float32),          # d1 cval
        ] if _use_d1(env) else []) + ([
            pltpu.VMEM((A, A * A, B), jnp.float32),      # d2 edge rows
            pltpu.VMEM((A, A * A, B), jnp.float32),      # d2 cvisit (enc)
            pltpu.VMEM((A, A * A, B), jnp.float32),      # d2 cval
        ] if _use_d2(env) else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    counts_f, rootq = kern(board_t, player_t, mc_t, root_prior.T,
                           value0.astype(jnp.float32).reshape(1, B),
                           live_t, W, aux, *ws)

    counts = counts_f.T.astype(jnp.int32)                # (B, A)
    total = jnp.maximum(counts.sum(axis=-1), 1).astype(jnp.float32)
    policy = counts.astype(jnp.float32) / total[:, None]
    return SearchResult(visit_counts=counts, policy=policy,
                        root_q=rootq.reshape(B), tree=None)

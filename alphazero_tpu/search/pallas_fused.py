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
flax compute path) — forward parity is tested to bf16 tolerance, search
behavior by invariants + tactics (tests/test_pallas_fused.py).

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
from alphazero_tpu.search.pallas_mcts import (NEG, _descend, _game_tables,
                                              _iota, _leaf_finish)

BF = jnp.bfloat16


def supports_fused(env, batch: int, cfg: MCTSConfig, model) -> bool:
    """Dense-family, network-mode, lane-aligned, sequential (leaf_batch=1),
    and tree + weights fit scoped VMEM."""
    from alphazero_tpu.models.dense import DenseTower
    if not isinstance(model, DenseTower):
        return False
    if cfg.leaf_batch != 1 or batch % 128 != 0:
        return False
    N = cfg.num_simulations + 1
    A = env.action_dim
    tree_bytes = (3 + 2 * A) * N * batch * 4
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
    ws.append(wT(params["value_head"]))                       # f32 (1, D/4)
    ws.append(b2(params["value_head"], 1))
    return ws


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
    value = jnp.tanh(
        jnp.dot(nxt(), v, preferred_element_type=jnp.float32) + nxt())
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)
    return probs, value


def _move_kernel(env, cfg: MCTSConfig, dcap: int, model, n_w: int,
                 *refs):
    """One whole move: simulations 1..S-1 with the network inside.

    refs layout:
      inputs:  board (2, RC, B), player (1, B), mc (1, B),
               root_prior (A, B), root_v (1, B), live (1, B),
               W (RC, L), aux, then n_w weight arrays
      outputs: counts (A, B) f32, rootq (1, B) f32
      scratch: visit/val/expd (N, B), prior (A, N, B), children (A, N, B),
               path (dcap, B) i32, apath (dcap, B) i32
    """
    (board_ref, player_ref, mc_ref, rprior_ref, rv_ref, live_ref,
     W_ref, aux_ref) = refs[:8]
    wrefs = refs[8:8 + n_w]
    counts_ref, rootq_ref = refs[8 + n_w:10 + n_w]
    (visit_s, val_s, expd_s, prior_s, children_s, path_s,
     apath_s) = refs[10 + n_w:]

    A = env.action_dim
    N = visit_s.shape[0]
    B = visit_s.shape[1]
    rootp = player_ref[:]
    rootmc = mc_ref[:]
    live = live_ref[:]

    # ---- root expansion (host-computed prior/value; ai/mcts.py:34-56)
    visit_s[:] = jnp.zeros((N, B), jnp.float32)
    val_s[:] = jnp.zeros((N, B), jnp.float32)
    expd_s[:] = jnp.zeros((N, B), jnp.float32)
    visit_s[0:1, :] = jnp.ones((1, B), jnp.float32)
    val_s[0:1, :] = jnp.where(live > 0, -rv_ref[:], 0.0)
    expd_s[0:1, :] = (live > 0).astype(jnp.float32)
    prior_s[:] = jnp.full((A, N, B), NEG, jnp.float32)
    prior_s[:, 0, :] = rprior_ref[:]
    children_s[:] = jnp.full((A, N, B), -1.0, jnp.float32)

    def make_sim(Nc):
        """Simulation body over the first ``Nc`` tree rows only.

        Simulation ``slot`` can only reference nodes < ``slot``, so every
        (N, B) op is restricted to the rows a segment can actually touch —
        bitwise-identical results (excluded rows contribute exact zeros to
        the one-hot contractions) at a fraction of the VPU work.
        """

        def sim(slot, _):
            visit = visit_s[0:Nc, :]
            val = val_s[0:Nc, :]
            expd = expd_s[0:Nc, :]
            p0_r = board_ref[0, :, :].astype(jnp.float32)      # (RC, B)
            p1_r = board_ref[1, :, :].astype(jnp.float32)
            if env.name == "connect4":
                h0 = jnp.dot(aux_ref[:], p0_r + p1_r,
                             preferred_element_type=jnp.float32)
            else:
                h0 = jnp.zeros((1, B), jnp.float32)
            depth, parent, action, chsel, p0, p1, heights = _descend(
                env, cfg, Nc, A, B, dcap, visit, val, expd,
                prior_s[:, 0:Nc, :], children_s[:, 0:Nc, :], path_s,
                apath_s, board=(p0_r, p1_r, h0, rootp))
            root_case = (parent < 0).astype(jnp.float32)
            alloc = ((parent >= 0) & (chsel < 0)).astype(jnp.float32)

            leaf, terminal, tval, obs, valid = _leaf_finish(
                env, B, W_ref, aux_ref, rootp, rootmc, depth, root_case,
                chsel, slot, alloc, p0, p1, heights)

            probs, value = _dense_forward(env, model, wrefs, obs, W_ref[:])

            # ---- expansion
            do_expand = (alloc > 0) & (terminal == 0)
            prior_s[:, pl.ds(slot, 1), :] = jnp.where(
                do_expand & (valid > 0), probs, NEG)[:, None, :]
            ohp = (_iota(Nc, B) == jnp.where(alloc > 0, parent, Nc)) \
                .astype(jnp.float32)
            oha = (_iota(A, B) == action).astype(jnp.float32)
            edge = ohp[None] * oha[:, None, :]
            children_s[:, 0:Nc, :] = jnp.where(
                edge > 0, slot.astype(jnp.float32), children_s[:, 0:Nc, :])

            # ---- backup (ai/node.py:62-74 semantics)
            leaf_value = jnp.where(terminal > 0, tval, -value)
            dmax = jnp.max(depth)

            def bk(c):
                d, visit, val, expd = c
                nd = path_s[pl.ds(jnp.minimum(d, dcap - 1), 1), :]
                nd = jnp.where(d == depth, leaf, nd)
                am = (d <= depth).astype(jnp.float32)
                sign = jnp.where((depth - d) % 2 == 0, 1.0, -1.0)
                oh = (_iota(Nc, B) == nd).astype(jnp.float32) * am
                visit = visit + oh
                val = val + oh * (sign * leaf_value)
                expd = expd + oh * jnp.where((d == depth) & do_expand,
                                             1.0, 0.0)
                return d + 1, visit, val, expd

            # 2x unroll — loop control dominates; overrun plies mask to 0
            _, visit, val, expd = jax.lax.while_loop(
                lambda c: c[0] <= dmax, lambda c: bk(bk(c)),
                (0, visit, val, expd))
            visit_s[0:Nc, :] = visit
            val_s[0:Nc, :] = val
            expd_s[0:Nc, :] = expd
            return 0

        return sim

    # Segment the sim loop so early simulations run on small tree windows.
    # Row budget: simulation s backs up into row ``leaf`` ≤ s, so sims
    # [lo, hi) need Nc ≥ hi rows (rounded to the 8-sublane tile).
    S = cfg.num_simulations
    n_seg = 4 if S >= 128 else (2 if S >= 64 else 1)
    lo = 1
    for k in range(1, n_seg + 1):
        hi = min(S, -(-S * k) // n_seg)
        Nc = min(N, -(-hi // 8) * 8)
        jax.lax.fori_loop(lo, hi, make_sim(Nc), 0)
        lo = hi

    # ---- root visit counts / q
    visit = visit_s[:]
    crow = children_s[:, 0, :]                                 # (A, B)
    cnt = []
    for a in range(A):
        oh = (_iota(N, B) == crow[a:a + 1, :].astype(jnp.int32)) \
            .astype(jnp.float32)
        cnt.append(jnp.sum(visit * oh, axis=0, keepdims=True))
    counts = jnp.concatenate(cnt, axis=0)
    counts_ref[:] = jnp.where(crow >= 0, counts, 0.0)
    rootq_ref[:] = val_s[0:1, :] / jnp.maximum(visit[0:1, :], 1.0)


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
            pltpu.VMEM((N, B), jnp.float32),             # visit
            pltpu.VMEM((N, B), jnp.float32),             # val
            pltpu.VMEM((N, B), jnp.float32),             # expd
            pltpu.VMEM((A, N, B), jnp.float32),          # prior
            pltpu.VMEM((A, N, B), jnp.float32),          # children
            pltpu.VMEM((dcap, B), jnp.int32),            # path
            pltpu.VMEM((dcap, B), jnp.int32),            # apath
        ],
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

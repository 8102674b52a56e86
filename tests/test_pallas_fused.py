"""Whole-move fused kernel (search/pallas_fused.py), interpret mode on CPU.

The in-kernel dense forward uses bf16 matmuls (as the flax compute path
does), so cross-engine equality is to tolerance, not bitwise; search
behavior is pinned by invariants + tactics + closeness to the XLA engine.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_tpu.config import MCTSConfig, ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts
from alphazero_tpu.search.pallas_fused import (_dense_forward,
                                               _game_tables,
                                               _pack_dense_params,
                                               run_mcts_fused)
from tests.oracles.games import make_oracle


def _setup(game="connect4", width=64, blocks=2):
    env = make_env(game)
    mcfg = ModelConfig(family="dense", width=width, blocks=blocks)
    model = build_model(mcfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    return env, model, params


def test_in_kernel_forward_matches_flax():
    """_dense_forward (games-in-lanes) ≡ the flax model to bf16 tolerance."""
    env, model, params = _setup(width=128, blocks=3)
    B = 16
    rng = jax.random.PRNGKey(3)
    boards = (jax.random.uniform(rng, (B, 2, env.rows, env.cols)) < 0.2) \
        .astype(jnp.int8)
    boards = boards.at[:, 1].set(boards[:, 1] * (1 - boards[:, 0]))
    players = jnp.zeros((B,), jnp.int32)
    obs = jax.vmap(env.observation_from_board)(boards, players) \
        .astype(jnp.float32)

    want_logits, want_value = model.apply({"params": params}, obs,
                                          deterministic=True)
    want_probs = jax.nn.softmax(want_logits, axis=-1)

    ws = _pack_dense_params(model, params)
    W = jnp.asarray(_game_tables(env)["W"])
    F, RC = env.feature_dim, env.rows * env.cols
    obs_t = obs.reshape(B, F * RC).T                       # (F·RC, B)

    def kernel(obs_ref, W_ref, *rest):
        wrefs = rest[:len(ws)]
        probs_ref, value_ref = rest[len(ws):]
        probs, value = _dense_forward(env, model, wrefs, obs_ref[:],
                                      W_ref[:])
        probs_ref[:] = probs
        value_ref[:] = value

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((env.action_dim, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        in_specs=[vspec] * (2 + len(ws)),
        out_specs=(vspec, vspec),
        interpret=True,
    )(obs_t, W, *ws)
    got_probs, got_value = np.asarray(out[0]).T, np.asarray(out[1])[0]

    np.testing.assert_allclose(got_probs, np.asarray(want_probs),
                               atol=0.02)
    np.testing.assert_allclose(got_value, np.asarray(want_value),
                               atol=0.03)


def test_interleaved_forward_matches_plain():
    """_dense_forward_2x (the B%256==0 production path of _leaf_eval) is a
    pure per-half reorder of _dense_forward with real packed params.

    BITWISE against the plain forward run per-half at B=128 — identical
    matmul shapes, so equality proves the stage interleave never mixes
    lanes or reassociates math.  Against the full-B plain forward only
    allclose holds ON CPU: interpret-mode matmuls (Eigen) reassociate the
    K-loop differently per column-tile count, so B=256 vs B=128 calls of
    the SAME math differ by ~1 ULP in lanes >= 128 (measured); on the MXU
    output columns are independent of the column count, so on-chip the
    full comparison is bitwise too (scripts/verify_fused_exact.py)."""
    from alphazero_tpu.search.pallas_fused import _dense_forward_2x, _leaf_eval

    env, model, params = _setup(width=128, blocks=3)
    B = 256                             # the default connect4 self-play case
    rng = jax.random.PRNGKey(7)
    boards = (jax.random.uniform(rng, (B, 2, env.rows, env.cols)) < 0.2) \
        .astype(jnp.int8)
    boards = boards.at[:, 1].set(boards[:, 1] * (1 - boards[:, 0]))
    players = jnp.zeros((B,), jnp.int32)
    obs = jax.vmap(env.observation_from_board)(boards, players) \
        .astype(jnp.float32)

    ws = _pack_dense_params(model, params)
    W = jnp.asarray(_game_tables(env)["W"])
    F, RC = env.feature_dim, env.rows * env.cols
    obs_t = obs.reshape(B, F * RC).T                       # (F·RC, B)

    def make_kernel(fwd, nb):
        def kernel(obs_ref, W_ref, *rest):
            wrefs = rest[:len(ws)]
            probs_ref, value_ref = rest[len(ws):]
            probs, value = fwd(env, model, wrefs, obs_ref[:], W_ref[:])
            probs_ref[:] = probs
            value_ref[:] = value

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((env.action_dim, nb),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((1, nb), jnp.float32)),
            in_specs=[vspec] * (2 + len(ws)),
            out_specs=(vspec, vspec),
            interpret=True,
        )

    # ---- BITWISE, eager: 2x(full) == plain(per half) — the interleave is a
    # pure reorder (same matmul shapes per half, no lane mixing, no float
    # reassociation).  jnp arrays support the kernels' ref ops directly.
    p2, v2 = _dense_forward_2x(env, model, ws, obs_t, W)
    ph0, vh0 = _dense_forward(env, model, ws, obs_t[:, :B // 2], W)
    ph1, vh1 = _dense_forward(env, model, ws, obs_t[:, B // 2:], W)
    np.testing.assert_array_equal(
        np.asarray(p2), np.concatenate([np.asarray(ph0), np.asarray(ph1)],
                                       axis=1))
    np.testing.assert_array_equal(
        np.asarray(v2), np.concatenate([np.asarray(vh0), np.asarray(vh1)],
                                       axis=1))

    # ---- in-kernel (interpret): ULP-class agreement vs the plain kernel
    # (XLA CPU fuses/reassociates matmul K-loops differently per program —
    # see docstring; the on-chip MXU path is bitwise)
    inter = make_kernel(_dense_forward_2x, B)(obs_t, W, *ws)
    plain = make_kernel(_dense_forward, B)(obs_t, W, *ws)
    np.testing.assert_allclose(np.asarray(inter[0]), np.asarray(plain[0]),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(inter[1]), np.asarray(plain[1]),
                               atol=2e-6)

    # and _leaf_eval actually routes B=256 through the interleaved path
    routed = make_kernel(_leaf_eval, B)(obs_t, W, *ws)
    np.testing.assert_array_equal(np.asarray(routed[0]),
                                  np.asarray(inter[0]))
    np.testing.assert_array_equal(np.asarray(routed[1]),
                                  np.asarray(inter[1]))


def _run_fused(env, model, params, cfg, boards, player=0, mc=0, seed=0):
    B = boards.shape[0]
    ev = make_eval_fn(model, params)
    return run_mcts_fused(env, model, params, ev, jnp.asarray(boards),
                          jnp.full(B, player, jnp.int32),
                          jnp.full(B, mc, jnp.int32),
                          jnp.zeros(B, jnp.bool_),
                          jax.random.PRNGKey(seed), cfg, interpret=True)


def test_fused_invariants_and_closeness():
    env, model, params = _setup()
    cfg = MCTSConfig(num_simulations=60, use_dirichlet=False)
    boards = jnp.zeros((4, 2, 6, 7), jnp.int8)
    got = _run_fused(env, model, params, cfg, boards)
    counts = np.asarray(got.visit_counts)
    np.testing.assert_array_equal(counts.sum(-1), [59] * 4)

    ev = make_eval_fn(model, params)
    ref = run_mcts(env, ev, boards, jnp.zeros(4, jnp.int32),
                   jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.bool_),
                   jax.random.PRNGKey(0), cfg, backend="xla")
    rc = np.asarray(ref.visit_counts)
    # bf16 vs f32 evals: distributions close, same top action
    assert (counts.argmax(-1) == rc.argmax(-1)).all()
    tv = np.abs(counts / 59.0 - rc / 59.0).sum(-1)
    assert tv.max() < 0.4, tv


def test_fused_finds_immediate_win():
    env, model, params = _setup("tictactoe", width=64, blocks=1)
    oracle = make_oracle("tictactoe")
    board = oracle.new_board()
    oracle.place(board, 0, 0)
    oracle.place(board, 1, 3)
    oracle.place(board, 0, 1)
    oracle.place(board, 1, 4)
    cfg = MCTSConfig(num_simulations=150, use_dirichlet=False)
    got = _run_fused(env, model, params, cfg, np.asarray(board)[None], mc=4)
    assert int(np.asarray(got.visit_counts)[0].argmax()) == 2


def test_fused_legality_masked():
    env, model, params = _setup()
    oracle = make_oracle("connect4")
    board = oracle.new_board()
    for i in range(6):
        oracle.place(board, i % 2, 3)      # column 3 full
    cfg = MCTSConfig(num_simulations=50, use_dirichlet=False)
    got = _run_fused(env, model, params, cfg, np.asarray(board)[None], mc=6)
    counts = np.asarray(got.visit_counts)[0]
    assert counts[3] == 0 and counts.sum() == 49


def test_fused_done_games_masked():
    """Finished games: zero counts (root unexpanded, same as other engines)."""
    env, model, params = _setup()
    cfg = MCTSConfig(num_simulations=30, use_dirichlet=False)
    boards = jnp.zeros((2, 2, 6, 7), jnp.int8)
    ev = make_eval_fn(model, params)
    got = run_mcts_fused(env, model, params, ev, boards,
                         jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                         jnp.array([False, True]), jax.random.PRNGKey(0),
                         cfg, interpret=True)
    counts = np.asarray(got.visit_counts)
    assert counts[0].sum() == 29
    assert counts[1].sum() == 0


# --------------------------------------------------------------------------
# multi-move self-play chunk kernel
# --------------------------------------------------------------------------

def _exact_stub_forwards(env):
    """A pair of evaluators (in-kernel stub, XLA eval_fn) computing the SAME
    function with exact float arithmetic: per-action scores are 1 + small
    integer stone counts (sums of 0/1 are exact in f32 in any reduction
    order), so both engines see bitwise-identical priors/values and the
    whole search + move pipeline must agree bitwise (VERDICT r1 #5)."""
    F, RC = env.feature_dim, env.rows * env.cols
    A = env.action_dim
    n = F * RC
    groups = np.stack([(np.arange(n) % A == a).astype(np.float32)
                       for a in range(A)])                  # (A, n)

    def kernel_stub(env_, model, wrefs, obs, W_lines, cfg=None):
        # obs (F·RC, B) of 0/1 values; group masks built in-kernel (pallas
        # kernels cannot capture array constants)
        ids = jax.lax.broadcasted_iota(jnp.int32, (n, obs.shape[1]), 0)
        mod = ids - A * (ids // A)
        rows = []
        tot = jnp.sum(obs, axis=0, keepdims=True)          # (1, B) ints
        for a in range(A):
            g = (mod == a).astype(jnp.float32)
            rows.append(1.0 + jnp.sum(obs * g, axis=0, keepdims=True))
        w = jnp.concatenate(rows, axis=0)                  # (A, B) ints
        probs = w / jnp.sum(w, axis=0, keepdims=True)
        # grid-align to 2^-14 so the kernel's packed-prior quantization
        # (pallas_fused._qfrac) is the identity — bitwise across engines
        probs = jnp.floor(probs * 16384.0 + 0.5) / 16384.0
        value = (tot - 5.0 * jnp.floor(tot / 5.0) - 2.0) / 4.0
        return probs, value

    def xla_eval(obs):                                      # (B, F, R, C)
        x = obs.reshape(obs.shape[0], -1)
        w = 1.0 + x @ jnp.asarray(groups.T)                 # (B, A) ints
        probs = w / jnp.sum(w, axis=-1, keepdims=True)
        probs = jnp.floor(probs * 16384.0 + 0.5) / 16384.0
        tot = jnp.sum(x, axis=-1)
        value = (tot - 5.0 * jnp.floor(tot / 5.0) - 2.0) / 4.0
        return probs, value

    return kernel_stub, xla_eval


@pytest.mark.parametrize("pipelined", [False, True])
def test_chunk_kernel_trajectory_bitwise_vs_xla_engine(monkeypatch,
                                                       pipelined):
    """The whole-chunk self-play kernel (M moves: root eval → search →
    greedy action → env step → reset, search/pallas_fused.py:_chunk_kernel)
    reproduces the XLA engine's per-move trajectory BITWISE under an exact
    stub evaluator: policies, actions, observations, terminals, boards."""
    import alphazero_tpu.search.pallas_fused as F

    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=64, blocks=1), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    kernel_stub, xla_eval = _exact_stub_forwards(env)
    monkeypatch.setattr(F, "_leaf_eval", kernel_stub)

    cfg = MCTSConfig(num_simulations=24, temperature_moves=0,
                     use_dirichlet=False)
    B, M = 4, 10
    from tests.oracles.games import make_oracle
    oracle = make_oracle("connect4")
    b0 = oracle.new_board()
    # game 1 starts one move from a win for player 0 (cols 0-2 bottom row)
    b1 = oracle.new_board()
    for c in range(3):
        oracle.place(b1, 0, c)
        oracle.place(b1, 1, c)
    boards = np.stack([b0, b1, b0, b1])
    players = np.array([0, 0, 1, 0], np.int32)
    mcs = np.array([0, 6, 0, 6], np.int32)

    rec = F.run_selfplay_chunk_fused(
        env, model, params, jnp.asarray(boards), jnp.asarray(players),
        jnp.asarray(mcs), jax.random.PRNGKey(7), cfg, M, interpret=True,
        pipelined=pipelined)
    rec = jax.tree.map(np.asarray, rec)

    # reference: the XLA engine, one move at a time
    import jax.numpy as jnp_
    from alphazero_tpu.envs.core import EnvState
    cur_b, cur_p, cur_mc = (jnp.asarray(boards), jnp.asarray(players),
                            jnp.asarray(mcs))
    for m in range(M):
        res = run_mcts(env, xla_eval, cur_b, cur_p, cur_mc,
                       jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg,
                       backend="xla")
        counts = np.asarray(res.visit_counts)
        policy = counts / np.maximum(counts.sum(-1, keepdims=True), 1)
        np.testing.assert_array_equal(policy.astype(np.float32),
                                      rec["policy"][m], err_msg=f"move {m}")
        action = counts.argmax(-1).astype(np.int32)        # greedy (temp 0)
        np.testing.assert_array_equal(action, rec["action"][m],
                                      err_msg=f"move {m}")
        obs = np.asarray(jax.vmap(env.observation_from_board)(cur_b, cur_p))
        np.testing.assert_array_equal(obs.astype(np.int8), rec["obs"][m])
        np.testing.assert_array_equal(np.asarray(cur_p), rec["player"][m])
        np.testing.assert_array_equal(np.asarray(cur_mc), rec["t"][m])

        states = EnvState(board=cur_b, current_player=cur_p,
                          move_count=cur_mc,
                          winner=jnp_.full((B,), -1, jnp_.int32),
                          done=jnp_.zeros((B,), bool))
        new = jax.vmap(env.step)(states, jnp.asarray(action))
        np.testing.assert_array_equal(np.asarray(new.done), rec["done"][m])
        np.testing.assert_array_equal(
            np.asarray(jnp_.where(new.done, new.winner, -1)),
            rec["winner"][m])
        # auto-reset
        done = np.asarray(new.done)
        cur_b = jnp.asarray(np.where(done[:, None, None, None], 0,
                                     np.asarray(new.board)).astype(np.int8))
        cur_p = jnp.asarray(np.where(done, 0, np.asarray(new.current_player))
                            .astype(np.int32))
        cur_mc = jnp.asarray(np.where(done, 0, np.asarray(new.move_count))
                             .astype(np.int32))

    np.testing.assert_array_equal(np.asarray(cur_b), rec["board"])
    np.testing.assert_array_equal(np.asarray(cur_p), rec["player_final"])
    np.testing.assert_array_equal(np.asarray(cur_mc), rec["mc_final"])
    # at least one game must have finished and reset within the chunk
    assert rec["done"].any()


def test_chunk_runner_matches_stepwise_bookkeeping():
    """selfplay_chunk_fused's slab/buffer/counter bookkeeping is consistent:
    buffer rows, games_done, results and trajectory slabs line up with the
    kernel records."""
    from alphazero_tpu.config import ReplayConfig
    from alphazero_tpu.data import create
    from alphazero_tpu.data.augment import Symmetries
    from alphazero_tpu.training.selfplay import (init_selfplay,
                                                 selfplay_chunk_fused)

    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=64, blocks=1), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    cfg = MCTSConfig(num_simulations=16, temperature_moves=2,
                     dirichlet_alpha=0.3)
    rcfg = ReplayConfig(capacity=4096)
    syms = Symmetries(env)
    B, M = 8, 12
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    buffer = create(env, rcfg.capacity)
    for _ in range(3):
        sp, buffer = selfplay_chunk_fused(env, model, params, cfg, rcfg,
                                          syms, sp, buffer, M,
                                          interpret=True)
    assert int(sp.env_steps) == 3 * M * B
    gd = int(sp.games_done)
    assert gd > 0
    res = np.asarray(sp.results)
    assert res.sum() == gd
    # every finished game flushed one replay block with ≥ 7 moves
    # (connect4's shortest decided game)
    assert int(buffer.size) == min(gd, buffer.capacity)
    lens = np.asarray(buffer.length[:int(buffer.size)])
    assert (lens >= 7).all()
    # slab policies of recorded rows are distributions
    t = np.asarray(sp.t)
    pol = np.asarray(sp.traj_policy)
    for b in range(B):
        if t[b] > 0:
            s = pol[b, :t[b]].sum(-1)
            np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_chunk_kernel_d0_only_mirrors_bitwise(monkeypatch):
    """Large-action dense envs (gomoku9-dense, A=81) drop the d1/d2
    mirrors to fit scoped VMEM (_use_d1/_use_d2 gates) and run with the
    d=0 peel only.  Simulate that configuration on connect4 and pin the
    whole-chunk trajectory bitwise against the XLA engine."""
    import alphazero_tpu.search.pallas_fused as F

    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=64, blocks=1), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    kernel_stub, xla_eval = _exact_stub_forwards(env)
    monkeypatch.setattr(F, "_leaf_eval", kernel_stub)
    monkeypatch.setattr(F, "_use_d1", lambda env_: False)
    monkeypatch.setattr(F, "_use_d2", lambda env_: False)

    cfg = MCTSConfig(num_simulations=24, temperature_moves=0,
                     use_dirichlet=False)
    B, M = 4, 6
    boards = jnp.zeros((B, 2, env.rows, env.cols), jnp.int8)
    players = jnp.zeros((B,), jnp.int32)
    mcs = jnp.zeros((B,), jnp.int32)
    rec = F.run_selfplay_chunk_fused(
        env, model, params, boards, players, mcs, jax.random.PRNGKey(7),
        cfg, M, interpret=True, pipelined=False)
    rec = jax.tree.map(np.asarray, rec)

    cur_b, cur_p, cur_mc = boards, players, mcs
    from alphazero_tpu.envs.core import EnvState
    for m in range(M):
        res = run_mcts(env, xla_eval, cur_b, cur_p, cur_mc,
                       jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg,
                       backend="xla")
        counts = np.asarray(res.visit_counts)
        policy = counts / np.maximum(counts.sum(-1, keepdims=True), 1)
        np.testing.assert_array_equal(policy.astype(np.float32),
                                      rec["policy"][m], err_msg=f"move {m}")
        action = counts.argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(action, rec["action"][m])
        states = EnvState(board=cur_b, current_player=cur_p,
                          move_count=cur_mc,
                          winner=jnp.full((B,), -1, jnp.int32),
                          done=jnp.zeros((B,), bool))
        new = jax.vmap(env.step)(states, jnp.asarray(action))
        done = np.asarray(new.done)
        cur_b = jnp.asarray(np.where(done[:, None, None, None], 0,
                                     np.asarray(new.board)).astype(np.int8))
        cur_p = jnp.asarray(
            np.where(done, 0, np.asarray(new.current_player)).astype(np.int32))
        cur_mc = jnp.asarray(
            np.where(done, 0, np.asarray(new.move_count)).astype(np.int32))


def test_chunk_kernel_nseg_exceeds_sims(monkeypatch):
    """A preset-tuned nseg larger than a small --sims override must not
    trace degenerate zero-row tree windows (round-5 regression: the
    connect4 preset's nseg=10 with the dryrun's 8 sims)."""
    import alphazero_tpu.search.pallas_fused as F

    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=64, blocks=1), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    kernel_stub, xla_eval = _exact_stub_forwards(env)
    monkeypatch.setattr(F, "_leaf_eval", kernel_stub)

    cfg = MCTSConfig(num_simulations=8, temperature_moves=0,
                     use_dirichlet=False, nseg=10)
    B, M = 4, 4
    boards = jnp.zeros((B, 2, env.rows, env.cols), jnp.int8)
    rec = F.run_selfplay_chunk_fused(
        env, model, params, boards, jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32), jax.random.PRNGKey(7), cfg, M,
        interpret=True, pipelined=False)
    rec = jax.tree.map(np.asarray, rec)

    cur_b, cur_p, cur_mc = (boards, jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B,), jnp.int32))
    res = run_mcts(env, xla_eval, cur_b, cur_p, cur_mc,
                   jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg,
                   backend="xla")
    counts = np.asarray(res.visit_counts)
    policy = counts / np.maximum(counts.sum(-1, keepdims=True), 1)
    np.testing.assert_array_equal(policy.astype(np.float32),
                                  rec["policy"][0])

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

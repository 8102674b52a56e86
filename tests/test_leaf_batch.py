"""Leaf-batched simulation rounds (MCTSConfig.leaf_batch > 1).

Production-throughput mode: K virtual-loss descents share one network
forward (search/mcts.py _simulate_round).  Not a reference behavior —
sequential semantics (leaf_batch=1, the default) keep exact oracle parity
in test_mcts_parity.py; these tests pin the invariants that must survive
batching: visit conservation (incl. partial final rounds), legality,
tactical strength, and end-to-end self-play integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.search import run_mcts
from tests.oracles.games import make_oracle
from tests.test_mcts_parity import _jax_eval, _stub_weights


def _run(env, cfg, board, player=0, mc=0, seed=0):
    Wp, wv = _stub_weights(env)
    B = board.shape[0]
    return run_mcts(env, _jax_eval(Wp, wv), jnp.asarray(board),
                    jnp.full(B, player, jnp.int32), jnp.full(B, mc, jnp.int32),
                    jnp.zeros(B, jnp.bool_), jax.random.PRNGKey(seed), cfg)


@pytest.mark.parametrize("sims,k", [(41, 4), (40, 4), (50, 8), (13, 16)])
def test_visit_conservation(sims, k):
    """Root-child visits total sims-1 for every (budget, K) shape,
    including partial final rounds and K > remaining budget."""
    env = make_env("connect4")
    cfg = MCTSConfig(num_simulations=sims, leaf_batch=k, use_dirichlet=False)
    board = jnp.zeros((4, 2, 6, 7), jnp.int8)
    res = _run(env, cfg, board)
    np.testing.assert_array_equal(
        np.asarray(res.visit_counts).sum(-1), [sims - 1] * 4)


def test_only_legal_actions_visited():
    env = make_env("connect4")
    oracle = make_oracle("connect4")
    board = oracle.new_board()
    # fill column 3 completely: illegal at the root
    for i in range(6):
        oracle.place(board, i % 2, 3)
    cfg = MCTSConfig(num_simulations=60, leaf_batch=8, use_dirichlet=False)
    res = _run(env, cfg, np.asarray(board)[None], mc=6)
    counts = np.asarray(res.visit_counts)[0]
    assert counts[3] == 0
    assert counts.sum() == 59


def test_finds_immediate_win_batched():
    """Tactics survive virtual-loss batching (cf. sequential twin in
    test_mcts_parity.py)."""
    env = make_env("tictactoe")
    oracle = make_oracle("tictactoe")
    board = oracle.new_board()
    oracle.place(board, 0, 0)
    oracle.place(board, 1, 3)
    oracle.place(board, 0, 1)
    oracle.place(board, 1, 4)
    cfg = MCTSConfig(num_simulations=200, leaf_batch=8, use_dirichlet=False)
    res = _run(env, cfg, np.asarray(board)[None], mc=4)
    assert int(np.asarray(res.visit_counts)[0].argmax()) == 2


def test_batched_close_to_sequential():
    """Same budget: batched and sequential root policies agree on the top
    action and correlate strongly on an early-game position."""
    env = make_env("connect4")
    board = jnp.zeros((1, 2, 6, 7), jnp.int8)
    seq = _run(env, MCTSConfig(num_simulations=120, use_dirichlet=False),
               board)
    bat = _run(env, MCTSConfig(num_simulations=120, leaf_batch=4,
                               use_dirichlet=False), board)
    ps = np.asarray(seq.policy)[0]
    pb = np.asarray(bat.policy)[0]
    assert ps.argmax() == pb.argmax()
    assert float(np.abs(ps - pb).sum()) < 0.35  # total variation


def test_selfplay_with_leaf_batch():
    """Self-play runner works end-to-end with leaf batching enabled."""
    from alphazero_tpu.config import ReplayConfig
    from alphazero_tpu.data import create
    from alphazero_tpu.models import build_model, init_params
    from alphazero_tpu.config import ModelConfig
    from alphazero_tpu.training.selfplay import (init_selfplay,
                                                 make_selfplay_runner)

    env = make_env("tictactoe")
    mcfg = ModelConfig(family="resnet", channels=16, blocks=1)
    model = build_model(mcfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    mcts_cfg = MCTSConfig(num_simulations=17, leaf_batch=4)
    replay_cfg = ReplayConfig(capacity=2048)
    runner = make_selfplay_runner(env, model, mcts_cfg, replay_cfg,
                                  num_steps=6, donate=False)
    sp = init_selfplay(env, 8, jax.random.PRNGKey(1))
    buffer = create(env, replay_cfg.capacity)
    sp, buffer = runner(params, sp, buffer)
    assert int(sp.env_steps) == 48
    assert int(buffer.size) > 0

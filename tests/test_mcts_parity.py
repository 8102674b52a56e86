"""Batched MCTS visit-distribution parity vs. the scalar oracle
(SURVEY.md §4-2): fixed NN stub, float64, dirichlet off — visit counts and
root Q must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.search import run_mcts
from tests.oracles.games import make_oracle
from tests.oracles.mcts import canonical_obs, oracle_mcts

GAMES = ["tictactoe", "connect4", "gomoku"]


def _stub_weights(env):
    rng = np.random.RandomState(42)
    n = env.feature_dim * env.rows * env.cols
    Wp = rng.randn(n, env.action_dim) * 0.5
    wv = rng.randn(n) * 0.5
    return Wp, wv


def _np_eval(Wp, wv):
    def f(obs):
        x = obs.reshape(-1).astype(np.float64)
        logits = x @ Wp
        probs = np.exp(logits) / np.sum(np.exp(logits))  # full softmax, ai/mcts.py:48
        return probs, np.tanh(x @ wv)
    return f


def _jax_eval(Wp, wv, dtype=jnp.float32):
    """NN stub evaluator.  ``dtype`` must be explicit: requesting float64
    outside a ``jax.enable_x64`` scope would silently truncate to f32
    (and warn) — callers pass float64 only inside that scope."""
    jWp, jwv = jnp.asarray(Wp), jnp.asarray(wv)

    def f(obs):  # (B, F, R, C)
        x = obs.reshape(obs.shape[0], -1).astype(dtype)
        logits = x @ jWp.astype(dtype)
        probs = jnp.exp(logits) / jnp.sum(jnp.exp(logits), axis=-1, keepdims=True)
        return probs, jnp.tanh(x @ jwv.astype(dtype))
    return f


def _random_positions(oracle, n_pos, max_depth, seed=0):
    """Non-terminal positions reached by random play, as (board, player, mc)."""
    rng = np.random.RandomState(seed)
    out = []
    while len(out) < n_pos:
        board = oracle.new_board()
        player, mc = 0, 0
        depth = rng.randint(0, max_depth + 1)
        ok = True
        for _ in range(depth):
            valid = oracle.valid_actions(board, mc)
            a = valid[rng.randint(len(valid))]
            cell = oracle.place(board, player, a)
            if oracle.check_win_at(board, player, cell) or mc + 1 >= oracle.max_moves:
                ok = False
                break
            player, mc = 1 - player, mc + 1
        if ok:
            out.append((board.copy(), player, mc))
    return out


@pytest.mark.parametrize("name", GAMES)
def test_visit_distribution_parity(name):
    env = make_env(name)
    oracle = make_oracle(name)
    Wp, wv = _stub_weights(env)
    num_sims = 60

    positions = _random_positions(oracle, n_pos=8, max_depth=6)
    boards = np.stack([p[0] for p in positions])
    players = np.array([p[1] for p in positions], np.int32)
    mcs = np.array([p[2] for p in positions], np.int32)

    cfg = MCTSConfig(num_simulations=num_sims, formula="reference",
                     use_dirichlet=False)
    with jax.enable_x64(True):
        res = run_mcts(
            env, _jax_eval(Wp, wv, dtype=jnp.float64),
            jnp.asarray(boards), jnp.asarray(players), jnp.asarray(mcs),
            jnp.zeros(len(positions), jnp.bool_),
            jax.random.PRNGKey(0), cfg, value_dtype=jnp.float64,
        )
        got_counts = np.asarray(res.visit_counts)
        got_q = np.asarray(res.root_q)

    np_eval = _np_eval(Wp, wv)
    for i, (board, player, mc) in enumerate(positions):
        want_counts, want_q = oracle_mcts(
            oracle, board.copy(), player, mc, num_sims,
            eval_fn=np_eval, feature_dim=env.feature_dim,
        )
        np.testing.assert_array_equal(got_counts[i], want_counts), (name, i)
        assert abs(got_q[i] - want_q) < 1e-9, (name, i)


def test_visits_sum_to_simulations():
    """Total root-child visits == sims - 1 (the root-expansion sim visits
    only the root, ai/mcts.py:16-60)."""
    env = make_env("tictactoe")
    Wp, wv = _stub_weights(env)
    cfg = MCTSConfig(num_simulations=40, use_dirichlet=False)
    board = jnp.zeros((4, 2, 3, 3), jnp.int8)
    res = run_mcts(env, _jax_eval(Wp, wv), board,
                   jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
                   jnp.zeros(4, jnp.bool_), jax.random.PRNGKey(1), cfg)
    np.testing.assert_array_equal(np.asarray(res.visit_counts).sum(-1),
                                  [39, 39, 39, 39])


def test_finds_immediate_win():
    """With enough sims the search must concentrate on a winning move."""
    env = make_env("tictactoe")
    oracle = make_oracle("tictactoe")
    # X(0) has two in a row on top; X to move; cell 2 wins.
    board = oracle.new_board()
    oracle.place(board, 0, 0)
    oracle.place(board, 1, 3)
    oracle.place(board, 0, 1)
    oracle.place(board, 1, 4)
    Wp, wv = _stub_weights(env)
    cfg = MCTSConfig(num_simulations=200, use_dirichlet=False)
    res = run_mcts(env, _jax_eval(Wp, wv),
                   jnp.asarray(board)[None], jnp.zeros(1, jnp.int32),
                   jnp.full(1, 4, jnp.int32), jnp.zeros(1, jnp.bool_),
                   jax.random.PRNGKey(2), cfg)
    assert int(np.asarray(res.visit_counts)[0].argmax()) == 2


def test_vanilla_mcts_finds_win_and_block():
    """Model-free UCB1+rollout search (ai/mcts.py:62-79) is tactical."""
    env = make_env("tictactoe")
    oracle = make_oracle("tictactoe")
    board = oracle.new_board()
    # O(1) threatens cells 6..8 line? Setup: player 0 to move must block at 5
    # after opponent has 3,4 — simpler: player 0 can win at 2.
    oracle.place(board, 0, 0)
    oracle.place(board, 1, 3)
    oracle.place(board, 0, 1)
    oracle.place(board, 1, 4)
    cfg = MCTSConfig(num_simulations=300, use_dirichlet=False)
    res = run_mcts(env, None,
                   jnp.asarray(board)[None], jnp.zeros(1, jnp.int32),
                   jnp.full(1, 4, jnp.int32), jnp.zeros(1, jnp.bool_),
                   jax.random.PRNGKey(3), cfg)
    assert int(np.asarray(res.visit_counts)[0].argmax()) == 2


def test_dirichlet_noise_changes_root_priors_only_statistically():
    """Noise on: visit distribution differs across seeds; off: identical."""
    env = make_env("connect4")
    Wp, wv = _stub_weights(env)
    board = jnp.zeros((1, 2, 6, 7), jnp.int8)
    args = (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.bool_))
    on = MCTSConfig(num_simulations=50, use_dirichlet=True,
                    dirichlet_alpha=0.3)
    off = MCTSConfig(num_simulations=50, use_dirichlet=False)
    r1 = run_mcts(env, _jax_eval(Wp, wv), board, *args, jax.random.PRNGKey(0), on)
    r2 = run_mcts(env, _jax_eval(Wp, wv), board, *args, jax.random.PRNGKey(7), on)
    r3 = run_mcts(env, _jax_eval(Wp, wv), board, *args, jax.random.PRNGKey(0), off)
    r4 = run_mcts(env, _jax_eval(Wp, wv), board, *args, jax.random.PRNGKey(7), off)
    assert not np.array_equal(np.asarray(r1.visit_counts), np.asarray(r2.visit_counts))
    np.testing.assert_array_equal(np.asarray(r3.visit_counts), np.asarray(r4.visit_counts))


def test_gomoku15_search_runs():
    """Full-size board (gomoku 15x15 config) searches under jit: shapes,
    legality, and visit conservation."""
    env = make_env("gomoku15")
    Wp, wv = _stub_weights(env)
    cfg = MCTSConfig(num_simulations=12, use_dirichlet=False)
    B = 2
    boards = jnp.zeros((B, 2, 15, 15), jnp.int8)
    res = run_mcts(env, _jax_eval(Wp, wv), boards,
                   jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                   jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg)
    counts = np.asarray(res.visit_counts)
    assert counts.shape == (B, 225)
    assert (counts.sum(-1) == cfg.num_simulations - 1).all()
    # opening move restricted to the center (gomoku.py:104-105)
    assert counts[:, 7 * 15 + 7].sum() == counts.sum()

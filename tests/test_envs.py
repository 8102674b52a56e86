"""Env engine correctness vs. the scalar oracle (SURVEY.md §4-1)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.envs import make_env
from tests.oracles.games import make_oracle

GAMES = ["tictactoe", "connect4", "gomoku", "gomoku9"]


@pytest.mark.parametrize("name", GAMES)
def test_random_playout_parity(name):
    """Step env and oracle through random games; every field must agree."""
    env = make_env(name)
    oracle = make_oracle(name)
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.valid_mask)
    rng = np.random.RandomState(0)

    for g in range(20):
        state = env.init()
        board = oracle.new_board()
        player, moves = 0, 0
        while True:
            mask = np.asarray(mask_fn(state))
            valid = oracle.valid_actions(board, moves)
            assert sorted(np.nonzero(mask)[0].tolist()) == sorted(valid), (
                name, g, moves)
            action = valid[rng.randint(len(valid))]
            cell = oracle.place(board, player, action)
            won = oracle.check_win_at(board, player, cell)
            state = step(state, jnp.int32(action))
            moves += 1
            np.testing.assert_array_equal(np.asarray(state.board), board)
            assert int(state.move_count) == moves
            if won:
                assert bool(state.done) and int(state.winner) == player
                break
            if moves == oracle.max_moves:
                assert bool(state.done) and int(state.winner) == -1
                break
            assert not bool(state.done) and int(state.winner) == -1
            player = 1 - player
        # stepping a finished game is a no-op
        before = jax.tree.map(np.asarray, state)
        after = jax.tree.map(np.asarray, step(state, jnp.int32(0)))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)


def test_tictactoe_exhaustive():
    """Exhaustive sweep of every reachable tictactoe position (5478 states):
    valid masks and win detection must match the oracle (SURVEY.md §4-1)."""
    oracle = make_oracle("tictactoe")
    env = make_env("tictactoe")

    seen = {}
    board = oracle.new_board()

    def dfs(player, moves):
        key = board.tobytes()
        if key in seen:
            return
        win0 = oracle.has_win(board, 0)
        win1 = oracle.has_win(board, 1)
        valid = oracle.valid_actions(board, moves) if not (win0 or win1) else []
        seen[key] = (board.copy(), win0, win1, valid, moves)
        if win0 or win1 or moves == 9:
            return
        for a in valid:
            cell = oracle.place(board, player, a)
            dfs(1 - player, moves + 1)
            oracle.unplace(board, player, cell)

    dfs(0, 0)
    assert len(seen) == 5478

    boards = np.stack([v[0] for v in seen.values()])
    wins0 = np.array([v[1] for v in seen.values()])
    wins1 = np.array([v[2] for v in seen.values()])

    got0 = np.asarray(env.won_batch(jnp.asarray(boards[:, 0])))
    got1 = np.asarray(env.won_batch(jnp.asarray(boards[:, 1])))
    np.testing.assert_array_equal(got0, wins0)
    np.testing.assert_array_equal(got1, wins1)


@pytest.mark.parametrize("name", GAMES)
def test_vmapped_step(name):
    """Batched stepping equals per-game stepping."""
    env = make_env(name)
    B = 32
    rng = jax.random.PRNGKey(1)
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    vstep = jax.jit(jax.vmap(env.step))
    vmask = jax.jit(jax.vmap(env.valid_mask))
    for t in range(5):
        rng, k = jax.random.split(rng)
        masks = vmask(states)
        logits = jnp.where(masks, 0.0, -jnp.inf)
        actions = jax.random.categorical(k, logits)
        states2 = vstep(states, actions)
        # spot-check one game against single-env step
        one = env.step(jax.tree.map(lambda x: x[3], states), actions[3])
        for a, b in zip(jax.tree.leaves(one),
                        jax.tree.leaves(jax.tree.map(lambda x: x[3], states2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        states = states2


def test_connect4_gravity():
    env = make_env("connect4")
    state = env.init()
    for i in range(6):
        state = env.step(state, jnp.int32(3))
    board = np.asarray(state.board)
    assert (board[0][:, 3] + board[1][:, 3]).sum() == 6
    assert not np.asarray(env.valid_mask(state))[3]
    # column alternates players bottom-up
    assert board[0, 5, 3] == 1 and board[1, 4, 3] == 1


def test_gomoku_opening_and_neighbors():
    env = make_env("gomoku")
    state = env.init()
    mask = np.asarray(env.valid_mask(state))
    assert mask.sum() == 1 and mask[3 * 7 + 3]
    state = env.step(state, jnp.int32(3 * 7 + 3))
    mask = np.asarray(env.valid_mask(state))
    assert mask.sum() == 8  # the 8 neighbors of the center


@pytest.mark.parametrize("name", GAMES)
def test_observation_canonical(name):
    env = make_env(name)
    state = env.init()
    # after one move, player 1 to move: their plane must be channel 0
    a = int(np.nonzero(np.asarray(env.valid_mask(state)))[0][0])
    state = env.step(state, jnp.int32(a))
    obs = np.asarray(env.observation(state))
    assert obs.shape == (env.feature_dim, env.rows, env.cols)
    np.testing.assert_array_equal(obs[0], 0 * obs[0])  # player 1 has no stones
    assert obs[1].sum() == 1  # opponent (player 0) has one stone
    if env.feature_dim == 3:
        assert (obs[2] == 1).all()  # to-move plane = current player (=1)

"""Replay buffer + augmentation tests (SURVEY.md §4-3)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.data import Symmetries, add_batch, create, sample
from alphazero_tpu.envs import make_env


def test_ring_buffer_write_and_wrap():
    env = make_env("tictactoe")
    buf = create(env, capacity=10)
    F = (env.feature_dim, env.rows, env.cols)

    def rows(vals):
        n = len(vals)
        obs = np.zeros((n,) + F, np.int8)
        obs[:, 0, 0, 0] = vals
        return (jnp.asarray(obs), jnp.ones((n, 9), jnp.float32) / 9,
                jnp.asarray(np.array(vals, np.float32)))

    obs, pol, val = rows([1, 2, 3, 4])
    mask = jnp.array([True, False, True, True])
    buf = add_batch(buf, obs, pol, val, mask)
    assert int(buf.size) == 3 and int(buf.cursor) == 3
    np.testing.assert_array_equal(np.asarray(buf.value[:3]), [1, 3, 4])

    # wrap around: 8 more rows → cursor wraps to (3+8)%10=1
    obs, pol, val = rows(list(range(10, 18)))
    buf = add_batch(buf, obs, pol, val, jnp.ones(8, bool))
    assert int(buf.size) == 10 and int(buf.cursor) == 1
    # slot 0 holds the last written row (17)
    assert float(buf.value[0]) == 17.0

    s_obs, s_pol, s_val = sample(buf, jax.random.PRNGKey(0), 32)
    assert s_obs.shape == (32,) + F and s_obs.dtype == jnp.float32


def test_dihedral_augmentation_matches_numpy_transforms():
    """Our 8 permutation gathers produce exactly the reference's 8 variants
    {rot k=0..3} ∪ {lr,tb flips of k=0,1} (train.py:40-49)."""
    env = make_env("gomoku")
    syms = Symmetries(env)
    rng = np.random.RandomState(0)
    board = (rng.rand(2, 7, 7) > 0.7).astype(np.float32)
    policy = rng.rand(49).astype(np.float32)

    expected = set()
    for k in range(4):
        b = np.rot90(board, k=k, axes=(1, 2))
        p = np.rot90(policy.reshape(7, 7), k=k)
        expected.add((b.tobytes(), p.copy().tobytes()))
        if k in (0, 1):
            expected.add((np.flip(b, 2).copy().tobytes(),
                          np.fliplr(p).copy().tobytes()))
            expected.add((np.flip(b, 1).copy().tobytes(),
                          np.flipud(p).copy().tobytes()))
    assert len(expected) == 8

    got = set()
    for s in range(syms.num):
        ob, pl = syms.apply(s, jnp.asarray(board), jnp.asarray(policy))
        got.add((np.asarray(ob).tobytes(),
                 np.asarray(pl).reshape(7, 7).tobytes()))
    assert got == expected


def test_connect4_symmetries_lr_only():
    env = make_env("connect4")
    syms = Symmetries(env)
    assert syms.num == 2
    rng = np.random.RandomState(1)
    board = (rng.rand(3, 6, 7) > 0.7).astype(np.float32)
    policy = rng.rand(7).astype(np.float32)
    ob, pl = syms.apply(1, jnp.asarray(board), jnp.asarray(policy))
    np.testing.assert_allclose(np.asarray(ob), board[:, :, ::-1])
    np.testing.assert_allclose(np.asarray(pl), policy[::-1])


def test_symmetry_preserves_win_and_validity():
    """A symmetric board transform must preserve win status and map valid
    moves to valid moves."""
    env = make_env("tictactoe")
    syms = Symmetries(env)
    rng = np.random.RandomState(2)
    board = np.zeros((2, 3, 3), np.int8)
    board[0, 0] = 1  # top row win for p0
    for s in range(8):
        ob, _ = syms.apply(s, jnp.asarray(board).astype(jnp.float32),
                           jnp.zeros(9))
        assert bool(env.won_batch(jnp.asarray(ob)[0][None])[0])

"""Pallas search engine equality vs the XLA engine (interpret mode on CPU).

Both engines compute the same exact arithmetic (one-hot 0/1 contractions),
so visit counts must be IDENTICAL, not just close."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.search.mcts import run_mcts
from alphazero_tpu.search.pallas_mcts import run_mcts_pallas
from tests.oracles.games import make_oracle
from tests.test_mcts_parity import (_jax_eval, _random_positions,
                                    _stub_weights)


@pytest.mark.parametrize("name", ["tictactoe", "connect4", "gomoku"])
def test_pallas_matches_xla_engine(name):
    env = make_env(name)
    oracle = make_oracle(name)
    Wp, wv = _stub_weights(env)
    eval_fn = _jax_eval32(Wp, wv)
    cfg = MCTSConfig(num_simulations=40, use_dirichlet=False)

    positions = _random_positions(oracle, n_pos=8, max_depth=6, seed=3)
    boards = jnp.asarray(np.stack([p[0] for p in positions]))
    players = jnp.asarray(np.array([p[1] for p in positions], np.int32))
    mcs = jnp.asarray(np.array([p[2] for p in positions], np.int32))
    dones = jnp.zeros(len(positions), bool)
    rng = jax.random.PRNGKey(0)

    ref = run_mcts(env, eval_fn, boards, players, mcs, dones, rng, cfg)
    got = run_mcts_pallas(env, eval_fn, boards, players, mcs, dones, rng,
                          cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.visit_counts),
                                  np.asarray(ref.visit_counts))
    np.testing.assert_allclose(np.asarray(got.root_q),
                               np.asarray(ref.root_q), atol=1e-5)


def _jax_eval32(Wp, wv):
    jWp = jnp.asarray(Wp, jnp.float32)
    jwv = jnp.asarray(wv, jnp.float32)

    def f(obs):
        x = obs.reshape(obs.shape[0], -1)
        logits = x @ jWp
        return jax.nn.softmax(logits, axis=-1), jnp.tanh(x @ jwv)
    return f


def _jax_eval_quantized(Wp, wv):
    """Stub whose outputs are exact binary fractions (multiples of 1/1024 /
    1/8), so every stats accumulation both engines perform is EXACT in f32
    regardless of summation order — cross-engine equality is then required,
    not probabilistic."""
    jWp = jnp.asarray(Wp, jnp.float32)
    jwv = jnp.asarray(wv, jnp.float32)

    def f(obs):
        x = obs.reshape(obs.shape[0], -1)
        probs = jax.nn.softmax(x @ jWp, axis=-1)
        probs = jnp.round(probs * 1024.0) / 1024.0
        v = jnp.round(jnp.tanh(x @ jwv) * 8.0) / 8.0
        return probs, v
    return f


# The Pallas round-kernel parity test was removed with the round kernel
# itself (measured slower than the per-sim engine at every K; see the
# tombstone note in search/pallas_mcts.py).  XLA-engine leaf-batch
# semantics remain covered by tests/test_leaf_batch.py.

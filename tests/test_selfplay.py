"""Self-play actor + learner integration tests (SURVEY.md §4-3,5)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import MCTSConfig, ModelConfig, ReplayConfig, TrainConfig
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.training.learner import l2_penalty, make_train_epoch
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner


def _setup(game="tictactoe", B=16, sims=24):
    env = make_env(game)
    model = build_model(
        ModelConfig(family="resnet", channels=8, blocks=1,
                    compute_dtype="float32"), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    mcts_cfg = MCTSConfig(num_simulations=sims, temperature_moves=2,
                          dirichlet_alpha=0.35)
    replay_cfg = ReplayConfig(capacity=4096)
    return env, model, params, mcts_cfg, replay_cfg, B


def test_selfplay_fills_buffer_and_counts():
    env, model, params, mcts_cfg, replay_cfg, B = _setup()
    runner = make_selfplay_runner(env, model, mcts_cfg, replay_cfg,
                                  num_steps=12, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    buf = create(env, replay_cfg.capacity)
    sp, buf = runner(params, sp, buf)

    assert int(sp.env_steps) == 12 * B
    # tictactoe games last ≤ 9 moves, so ≥ B games finished in 12 steps
    assert int(sp.games_done) >= B
    assert int(sp.results.sum()) == int(sp.games_done)
    n_blocks = int(buf.size)
    assert n_blocks == int(sp.games_done)  # one block per finished game

    # every recorded policy row is a distribution over valid actions
    lens = np.asarray(buf.length[:n_blocks])
    assert (lens >= 5).all() and (lens <= env.max_moves).all()
    pol = np.asarray(buf.policy)
    obs = np.asarray(buf.obs)
    for g in range(n_blocks):
        np.testing.assert_allclose(pol[g, :lens[g]].sum(-1), 1.0, atol=1e-5)
        # observations are canonical 0/1 planes, one more stone per row
        assert set(np.unique(obs[g, :lens[g]])).issubset({0, 1})
        stones = obs[g, :lens[g], :2].reshape(lens[g], -1).sum(-1)
        np.testing.assert_array_equal(stones, np.arange(lens[g]))
    assert set(np.unique(np.asarray(buf.winner[:n_blocks]))) \
        .issubset({-1, 0, 1})


def test_selfplay_value_targets_alternate_parity():
    """Sampled value targets reproduce the reference's outcome-with-parity
    rule (train.py:33-36): in a decided game the value at row r is +1 when
    ``r % 2`` equals the winner (games open with player 0), else -1; draws
    are 0 everywhere."""
    from alphazero_tpu.data import sample

    env, model, params, mcts_cfg, _, B = _setup(B=8)
    replay_cfg = ReplayConfig(capacity=4096, augment=False)
    runner = make_selfplay_runner(env, model, mcts_cfg, replay_cfg,
                                  num_steps=10, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(3))
    buf = create(env, replay_cfg.capacity)
    sp, buf = runner(params, sp, buf)
    n_blocks = int(buf.size)
    assert n_blocks > 0
    winner = np.asarray(buf.winner[:n_blocks])
    lens = np.asarray(buf.length[:n_blocks])
    # reconstruct every position's expected target and compare against a
    # large sample's empirical (obs → value) mapping
    obs_s, pol_s, val_s = jax.tree.map(
        np.asarray, sample(buf, jax.random.PRNGKey(9), 512))
    assert set(np.unique(val_s)).issubset({-1.0, 0.0, 1.0})
    if (winner >= 0).any():
        assert (val_s == 1).sum() > 0 and (val_s == -1).sum() > 0
    # direct rule check: a sampled row with r stones is move r of its game;
    # with a single decided game in the buffer, value must follow parity
    one = create(env, 512)
    g0 = int(np.argmax(winner >= 0)) if (winner >= 0).any() else None
    if g0 is not None:
        from alphazero_tpu.data import add_games
        one = add_games(
            one, buf.obs[g0][None], buf.policy[g0][None],
            buf.length[g0][None], buf.winner[g0][None],
            jnp.ones((1,), bool))
        o, _, v = jax.tree.map(np.asarray,
                               sample(one, jax.random.PRNGKey(11), 256))
        r_of = o[:, :2].reshape(256, -1).sum(-1).astype(int)  # stones = row
        want = np.where(r_of % 2 == winner[g0], 1.0, -1.0)
        np.testing.assert_array_equal(v, want)


def test_learner_reduces_loss():
    env, model, params, mcts_cfg, replay_cfg, B = _setup()
    runner = make_selfplay_runner(env, model, mcts_cfg, replay_cfg,
                                  num_steps=10, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(4))
    buf = create(env, replay_cfg.capacity)
    sp, buf = runner(params, sp, buf)

    cfg = TrainConfig(batch_size=64, learning_rate=3e-3, l2_coeff=1e-4)
    import optax
    from alphazero_tpu.training.learner import make_optimizer
    opt_state = make_optimizer(cfg).init(params)
    epoch = make_train_epoch(model, cfg, num_steps=30, donate=False)
    params2, opt_state, m1 = epoch(params, opt_state, buf,
                                   jax.random.PRNGKey(5), jnp.int32(30))
    _, _, m2 = epoch(params2, opt_state, buf, jax.random.PRNGKey(6),
                     jnp.int32(30))
    assert float(m2.loss) < float(m1.loss)
    assert np.isfinite(float(m1.policy_loss)) and np.isfinite(float(m1.value_loss))


def test_train_epoch_partial_chunk_exact():
    """num_active masks the scan tail: a 4-step epoch asked for 1 active
    step produces bit-identical params to a 1-step epoch (VERDICT r4 weak
    #7 — schedules no longer round up to the chunk length)."""
    env, model, params, mcts_cfg, replay_cfg, B = _setup()
    runner = make_selfplay_runner(env, model, mcts_cfg, replay_cfg,
                                  num_steps=10, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(4))
    buf = create(env, replay_cfg.capacity)
    sp, buf = runner(params, sp, buf)

    cfg = TrainConfig(batch_size=64, learning_rate=3e-3, l2_coeff=1e-4)
    from alphazero_tpu.training.learner import make_optimizer
    opt_state = make_optimizer(cfg).init(params)
    e4 = make_train_epoch(model, cfg, num_steps=4, donate=False)
    e1 = make_train_epoch(model, cfg, num_steps=1, donate=False)
    p_a, _, m_a = e4(params, opt_state, buf, jax.random.PRNGKey(5),
                     jnp.int32(1))
    p_b, _, m_b = e1(params, opt_state, buf, jax.random.PRNGKey(5),
                     jnp.int32(1))
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_a.loss) == float(m_b.loss)
    # and a fully-active epoch differs (the mask really gated steps 1-3)
    p_c, _, _ = e4(params, opt_state, buf, jax.random.PRNGKey(5),
                   jnp.int32(4))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_c)))


def test_l2_excludes_biases_only():
    env, model, params, *_ = _setup()
    l2 = float(l2_penalty(params))
    # manual: sum of squares of all non-bias leaves
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key
        if name != "bias":
            total += float(np.sum(np.asarray(leaf) ** 2))
    np.testing.assert_allclose(l2, total, rtol=1e-6)
    assert l2 > 0

"""Sharded execution tests on the 8-virtual-device CPU mesh
(SURVEY.md §4-4: distributed tests without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import (Config, MCTSConfig, ModelConfig,
                                  ReplayConfig, TrainConfig)
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.parallel import (jit_super_step, make_mesh,
                                    vit_param_sharding)
from alphazero_tpu.training.learner import loss_fn
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner


def _cfg(family="resnet"):
    model = (ModelConfig(family="vit", embed_dim=32, patch_size=3,
                         num_heads=4, depth=1, dropout=0.0,
                         compute_dtype="float32")
             if family == "vit" else
             ModelConfig(family="resnet", channels=8, blocks=1,
                         compute_dtype="float32"))
    return Config(
        env="tictactoe",
        mcts=MCTSConfig(num_simulations=12, temperature_moves=2,
                        dirichlet_alpha=0.35),
        model=model,
        replay=ReplayConfig(capacity=1024),
        train=TrainConfig(batch_size=32, selfplay_batch=16),
    )


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


@pytest.mark.parametrize("family,n_model", [("resnet", 1), ("vit", 2)])
def test_super_step_runs_sharded(family, n_model):
    """Full actor-learner super-step over a (data, model) mesh: dp for the
    game batch and gradients, tp for the ViT."""
    cfg = _cfg(family)
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    params = init_params(model, env, jax.random.PRNGKey(0))
    sp = init_selfplay(env, cfg.train.selfplay_batch, jax.random.PRNGKey(1))
    buffer = create(env, cfg.replay.capacity)

    step, params, sp, buffer = jit_super_step(
        env, model, cfg, mesh, params, sp, buffer,
        selfplay_steps=10, train_steps=4,
    )
    params2, sp2, buffer2, rng, metrics = step(
        params, sp, buffer, jax.random.PRNGKey(2)
    )
    assert int(sp2.env_steps) == 10 * cfg.train.selfplay_batch
    # buffer is sharded: one ring per data shard, each locally written
    assert buffer2.size.shape == (8 // n_model,)
    assert int(np.sum(buffer2.size)) > 0
    assert np.isfinite(float(metrics.loss))
    # params actually updated
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2))
    )
    assert moved


def test_vit_tp_matches_replicated_forward():
    """Tensor-parallel ViT forward/backward equals the single-device result."""
    cfg = _cfg("vit")
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (16, env.feature_dim, env.rows, env.cols))

    logits_ref, value_ref = model.apply({"params": params}, x,
                                        deterministic=True)

    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = vit_param_sharding(params, mesh)
    params_tp = jax.device_put(params, p_sh)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    logits_tp, value_tp = fwd(params_tp, x)
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value_tp), np.asarray(value_ref),
                               rtol=1e-5, atol=1e-5)


def test_data_parallel_gradients_match_single_device():
    """Sharded-batch gradient == single-device gradient (the psum is exact
    up to float reassociation)."""
    cfg = _cfg("resnet")
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1),
                             (64, env.feature_dim, env.rows, env.cols))
    pol = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (64, 9)))
    val = jnp.zeros(64)

    def grads_of(p, o):
        return jax.grad(lambda q: loss_fn(model, q, o, pol, val, 1e-4)[0])(p)

    g_ref = jax.jit(grads_of)(params, obs)

    mesh = make_mesh(n_data=8, n_model=1)
    from jax.sharding import NamedSharding, PartitionSpec as P
    obs_sh = jax.device_put(obs, NamedSharding(mesh, P("data")))
    g_dp = jax.jit(grads_of)(params, obs_sh)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_checkpoint_roundtrip_under_sharding(tmp_path):
    """Orbax save/restore of sharded state (params replicated, buffer
    sharded over 'data') restores bit-identical content with the same
    shardings (VERDICT r1 #10: restore-under-sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from alphazero_tpu.data import add_games, create_sharded
    from alphazero_tpu.utils.checkpoint import CheckpointManager

    env = make_env("tictactoe")
    mesh = make_mesh(n_data=8, n_model=1)
    S = 8
    L = env.max_moves
    buf = create_sharded(env, capacity=64 * L, num_shards=S)
    n = 16
    obs = jnp.zeros((n, L, env.feature_dim, env.rows, env.cols), jnp.int8)
    obs = obs.at[:, :, 0, 0, 0].set(jnp.arange(n)[:, None].astype(jnp.int8))
    buf = add_games(buf, obs, jnp.ones((n, L, 9), jnp.float32) / 9,
                    jnp.full((n,), L, jnp.int32),
                    jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool))
    buf_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), buf)

    cfg = _cfg("resnet")
    model = build_model(cfg.model, env)
    params = jax.device_put(init_params(model, env, jax.random.PRNGKey(0)),
                            NamedSharding(mesh, P()))
    state = {"params": params, "buffer": buf_sh,
             "rng": jax.random.PRNGKey(3)}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    restored = mgr.restore(state, step=1)

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shardings survive the roundtrip
    assert restored["buffer"].length.sharding.spec == P("data")
    mgr.close()

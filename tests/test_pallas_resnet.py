"""Fused ResNet inference kernel vs the flax forward (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.ops.pallas_resnet import make_fused_apply


@pytest.mark.parametrize("game", ["connect4", "tictactoe"])
def test_fused_resnet_matches_flax(game):
    env = make_env(game)
    cfg = ModelConfig(family="resnet", channels=32, blocks=2,
                      compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))

    rng = np.random.RandomState(1)
    obs = rng.rand(8, env.feature_dim, env.rows, env.cols).astype(np.float32)
    ref_logits, ref_value = model.apply({"params": params},
                                        jnp.asarray(obs), deterministic=True)

    fused = make_fused_apply(env, cfg.channels, cfg.blocks, interpret=True)
    logits, value = fused(params, jnp.asarray(obs))
    # kernel runs the tower matmuls in bf16; tolerance accordingly
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               rtol=0.05, atol=0.05)


def test_fused_resnet_im2col_path():
    """Lane-aligned channels (C=128) take the single-dot im2col conv; the
    gomoku9-class depth exercises the fori_loop block body with
    dynamically indexed weights."""
    env = make_env("tictactoe")
    cfg = ModelConfig(family="resnet", channels=128, blocks=3,
                      compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))

    rng = np.random.RandomState(2)
    obs = rng.rand(4, env.feature_dim, env.rows, env.cols).astype(np.float32)
    ref_logits, ref_value = model.apply({"params": params},
                                        jnp.asarray(obs), deterministic=True)
    fused = make_fused_apply(env, cfg.channels, cfg.blocks, interpret=True)
    logits, value = fused(params, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               rtol=0.05, atol=0.05)


def test_fused_resnet_geometry_from_model():
    """make_fused_apply accepts the ResNet module itself as the geometry
    source (models.make_eval_fn passes the model, not the env)."""
    env = make_env("tictactoe")
    cfg = ModelConfig(family="resnet", channels=32, blocks=2,
                      compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    obs = jnp.zeros((2, env.feature_dim, env.rows, env.cols), jnp.float32)
    ref_logits, ref_value = model.apply({"params": params}, obs,
                                        deterministic=True)
    fused = make_fused_apply(model, cfg.channels, cfg.blocks, interpret=True)
    logits, value = fused(params, obs)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               rtol=0.05, atol=0.05)

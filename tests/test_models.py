"""Model tests: ViT numeric parity vs the reference torch net on fixed
weights (SURVEY.md §7 build-order step 4), plus shape/grad sanity."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn

REF = "/root/reference"


def _load_reference_net():
    """Import the reference torch ViT (read-only) for numeric comparison."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF)
    try:
        from ai.nn import Net  # the reference module, ai/nn.py
    finally:
        sys.path.pop(0)
    return Net


def _torch_to_flax(state_dict, depth):
    """Map reference torch parameter names/layouts to our flax tree."""
    import torch

    def t(x):
        return np.asarray(x.detach().numpy())

    E = state_dict["embedding.cls_token"].shape[-1]
    params = {
        "patch_embed": {
            # torch conv weight (E, C, k, k) → flax (k, k, C, E)
            "kernel": t(state_dict["embedding.patch_embed.patch_embed.weight"]).transpose(2, 3, 1, 0),
            "bias": t(state_dict["embedding.patch_embed.patch_embed.bias"]),
        },
        "cls_token": t(state_dict["embedding.cls_token"]),
        "pos_embed": t(state_dict["embedding.pos_embedding"]),
        "norm": {
            "scale": t(state_dict["norm.weight"]),
            "bias": t(state_dict["norm.bias"]),
        },
        "policy_head": {
            "kernel": t(state_dict["policy_head.weight"]).T,
            "bias": t(state_dict["policy_head.bias"]),
        },
        "value_head": {
            "kernel": t(state_dict["value_head.weight"]).T,
            "bias": t(state_dict["value_head.bias"]),
        },
    }
    for i in range(depth):
        pre = f"blocks.{i}."
        in_w = t(state_dict[pre + "attn.in_proj_weight"])  # (3E, E)
        in_b = t(state_dict[pre + "attn.in_proj_bias"])
        out_w = t(state_dict[pre + "attn.out_proj.weight"])  # (E, E)
        out_b = t(state_dict[pre + "attn.out_proj.bias"])
        H = 8
        hd = E // H
        def qkv(w, b):
            return {"kernel": w.T.reshape(E, H, hd), "bias": b.reshape(H, hd)}
        params[f"block_{i}"] = {
            "norm1": {"scale": t(state_dict[pre + "norm1.weight"]),
                      "bias": t(state_dict[pre + "norm1.bias"])},
            "norm2": {"scale": t(state_dict[pre + "norm2.weight"]),
                      "bias": t(state_dict[pre + "norm2.bias"])},
            "attn": {
                "query": qkv(in_w[:E], in_b[:E]),
                "key": qkv(in_w[E:2 * E], in_b[E:2 * E]),
                "value": qkv(in_w[2 * E:], in_b[2 * E:]),
                "out": {"kernel": out_w.T.reshape(H, hd, E), "bias": out_b},
            },
            "mlp_fc1": {"kernel": t(state_dict[pre + "mlp.0.weight"]).T,
                        "bias": t(state_dict[pre + "mlp.0.bias"])},
            "mlp_fc2": {"kernel": t(state_dict[pre + "mlp.3.weight"]).T,
                        "bias": t(state_dict[pre + "mlp.3.bias"])},
        }
    return jax.tree.map(jnp.asarray, params)


def test_vit_matches_reference_torch():
    import torch

    Net = _load_reference_net()
    env = make_env("gomoku")
    depth = 2
    torch.manual_seed(0)
    ref = Net(env.rows, patch_size=5, embed_dim=64, action_dim=env.action_dim,
              num_heads=8, depth=depth, channels=env.feature_dim, dropout=0.0)
    ref.eval()

    cfg = ModelConfig(family="vit", embed_dim=64, patch_size=5, num_heads=8,
                      depth=depth, dropout=0.0, compute_dtype="float32")
    model = build_model(cfg, env)
    params = _torch_to_flax(ref.state_dict(), depth)

    rng = np.random.RandomState(3)
    x = rng.rand(4, env.feature_dim, env.rows, env.cols).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_value = ref(torch.from_numpy(x))
    logits, value = model.apply({"params": params}, jnp.asarray(x),
                                deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), ref_value.numpy()[:, 0],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("family", ["vit", "resnet", "dense"])
@pytest.mark.parametrize("game", ["tictactoe", "connect4", "gomoku"])
def test_model_shapes_and_grads(family, game):
    env = make_env(game)
    cfg = ModelConfig(family=family, embed_dim=32, patch_size=3, depth=1,
                      channels=16, blocks=2, width=64,
                      compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    x = jnp.ones((5, env.feature_dim, env.rows, env.cols), jnp.float32)
    logits, value = model.apply({"params": params}, x, deterministic=True)
    assert logits.shape == (5, env.action_dim)
    assert value.shape == (5,)
    assert np.all(np.abs(np.asarray(value)) <= 1.0)

    def loss(p):
        lg, v = model.apply({"params": p}, x, deterministic=True)
        return jnp.mean(lg**2) + jnp.mean(v**2)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_eval_fn_softmax():
    env = make_env("connect4")
    cfg = ModelConfig(family="resnet", channels=16, blocks=1,
                      compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    eval_fn = make_eval_fn(model, params)
    obs = jnp.zeros((7, env.feature_dim, env.rows, env.cols))
    probs, value = eval_fn(obs)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    assert value.shape == (7,)


def test_bfloat16_compute_path():
    env = make_env("connect4")
    cfg = ModelConfig(family="resnet", channels=32, blocks=2,
                      compute_dtype="bfloat16")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    # params stay f32, outputs f32
    assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(params))
    logits, value = model.apply(
        {"params": params},
        jnp.ones((3, env.feature_dim, env.rows, env.cols)),
        deterministic=True,
    )
    assert logits.dtype == jnp.float32 and value.dtype == jnp.float32


def test_expand_vit_depth_preserves_function():
    """Depth surgery (reference expand_transformer_layers, main.py:99-120):
    copied blocks keep their weights; new blocks are fresh."""
    from alphazero_tpu.models.surgery import expand_vit_depth

    env = make_env("tictactoe")
    cfg = ModelConfig(family="vit", embed_dim=32, patch_size=3, num_heads=4,
                      depth=1, dropout=0.0, compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))

    cfg2, model2, params2 = expand_vit_depth(cfg, env, params, 3,
                                             jax.random.PRNGKey(1))
    assert cfg2.depth == 3
    # block 0 copied exactly
    a = jax.tree.leaves(params["block_0"])
    b = jax.tree.leaves(params2["block_0"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
    # embedding + heads copied
    np.testing.assert_array_equal(np.asarray(params["cls_token"]),
                                  np.asarray(params2["cls_token"]))
    np.testing.assert_array_equal(
        np.asarray(params["policy_head"]["kernel"]),
        np.asarray(params2["policy_head"]["kernel"]))
    # new blocks exist and run
    x = jnp.ones((2, env.feature_dim, env.rows, env.cols))
    logits, value = model2.apply({"params": params2}, x, deterministic=True)
    assert logits.shape == (2, env.action_dim)


def test_training_dropout_active():
    """The learner trains with dropout ACTIVE for the ViT family — the
    reference's model.train() (train.py:92) with Dropout(0.1) in
    ai/nn.py:44,58 — and inference stays deterministic.  Families without
    Dropout modules are unaffected by the rng."""
    from alphazero_tpu.training.learner import loss_fn

    env = make_env("tictactoe")
    cfg = ModelConfig(family="vit", embed_dim=32, patch_size=3, num_heads=4,
                      depth=1, dropout=0.5, compute_dtype="float32")
    model = build_model(cfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    obs = jax.random.normal(
        jax.random.PRNGKey(1), (8, env.feature_dim, env.rows, env.cols))
    pol = jnp.ones((8, env.action_dim)) / env.action_dim
    val = jnp.zeros((8,))

    l_a, _ = loss_fn(model, params, obs, pol, val, 0.0,
                     dropout_rng=jax.random.PRNGKey(2))
    l_b, _ = loss_fn(model, params, obs, pol, val, 0.0,
                     dropout_rng=jax.random.PRNGKey(3))
    assert float(l_a) != float(l_b)          # dropout mask really applies
    l_c, _ = loss_fn(model, params, obs, pol, val, 0.0)
    l_d, _ = loss_fn(model, params, obs, pol, val, 0.0)
    assert float(l_c) == float(l_d)          # eval mode is deterministic

    # dense family: no Dropout modules — rng is a no-op
    dcfg = ModelConfig(family="dense", width=32, blocks=1,
                       compute_dtype="float32")
    dmodel = build_model(dcfg, env)
    dparams = init_params(dmodel, env, jax.random.PRNGKey(0))
    l_e, _ = loss_fn(dmodel, dparams, obs, pol, val, 0.0,
                     dropout_rng=jax.random.PRNGKey(2))
    l_f, _ = loss_fn(dmodel, dparams, obs, pol, val, 0.0)
    np.testing.assert_allclose(float(l_e), float(l_f), rtol=0, atol=0)

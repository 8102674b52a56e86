"""Policy/value networks (reference: ai/nn.py) and evaluator adapters."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from alphazero_tpu.config import ModelConfig
from alphazero_tpu.models.dense import DenseTower
from alphazero_tpu.models.resnet import ResNet
from alphazero_tpu.models.vit import ViT


def build_model(cfg: ModelConfig, env):
    """Construct the configured network family for an env's geometry."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.family == "vit":
        return ViT(
            rows=env.rows, cols=env.cols, action_dim=env.action_dim,
            channels=env.feature_dim, embed_dim=cfg.embed_dim,
            patch_size=cfg.patch_size, num_heads=cfg.num_heads,
            depth=cfg.depth, dropout=cfg.dropout, dtype=dtype,
        )
    if cfg.family == "resnet":
        return ResNet(
            rows=env.rows, cols=env.cols, action_dim=env.action_dim,
            channels_in=env.feature_dim, channels=cfg.channels,
            blocks=cfg.blocks, dtype=dtype,
        )
    if cfg.family == "dense":
        return DenseTower(
            rows=env.rows, cols=env.cols, action_dim=env.action_dim,
            channels_in=env.feature_dim, win_len=env.win_len,
            width=cfg.width, blocks=cfg.blocks, dtype=dtype,
        )
    raise ValueError(f"unknown model family {cfg.family!r}")


def init_params(model, env, rng):
    dummy = jnp.zeros((1, env.feature_dim, env.rows, env.cols), jnp.float32)
    return model.init({"params": rng}, dummy, deterministic=True)["params"]


def make_eval_fn(model, params) -> Callable[[jax.Array], Tuple[jax.Array, jax.Array]]:
    """Batched MCTS evaluator: obs → (softmax policy over ALL actions, value).

    The reference softmaxes the full logit vector with no legal-move masking
    (ai/mcts.py:48); invalid-action priors are simply never selected.
    """

    def eval_fn(obs):
        logits, value = model.apply({"params": params}, obs, deterministic=True)
        return jax.nn.softmax(logits, axis=-1), value

    if isinstance(model, DenseTower):
        # lets run_mcts dispatch to the whole-move fused kernel
        # (search/pallas_fused.py) when it applies
        eval_fn.dense_spec = (model, params)
    return eval_fn


__all__ = ["ViT", "ResNet", "DenseTower", "build_model", "init_params",
           "make_eval_fn"]

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

    ResNet family on TPU: the conv tower runs in the fused Pallas kernel
    (ops/pallas_resnet.py) — the XLA conv forward measured 33-53% MXU at
    benchmark board sizes.  Inference only; training gradients keep the
    flax forward.
    """
    apply = _fast_apply(model)
    packed = apply.pack(params) if hasattr(apply, "pack") else None

    def eval_fn(obs):
        if packed is not None:   # weights packed ONCE, reused per call —
            # inside a jitted sim loop the packing hoists out as a
            # loop constant instead of restacking every simulation
            logits, value = apply.apply_packed(packed, obs)
        else:
            logits, value = apply(params, obs)
        return jax.nn.softmax(logits, axis=-1), value

    if isinstance(model, DenseTower):
        # lets run_mcts dispatch to the whole-move fused kernel
        # (search/pallas_fused.py) when it applies
        eval_fn.dense_spec = (model, params)
    return eval_fn


def _fast_apply(model) -> Callable:
    """``apply(params, obs) -> (logits, value)`` — the fastest available
    deterministic inference forward for this model on this platform."""
    if isinstance(model, ResNet):
        from alphazero_tpu.ops.pallas_resnet import (make_fused_apply,
                                                     supports_fused_resnet)
        if supports_fused_resnet(model, 0):
            return make_fused_apply(model, model.channels, model.blocks)

    def apply(params, obs):
        return model.apply({"params": params}, obs, deterministic=True)

    return apply


__all__ = ["ViT", "ResNet", "DenseTower", "build_model", "init_params",
           "make_eval_fn"]

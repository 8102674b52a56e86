"""SGD learner (reference: train.train, train.py:85-123).

Loss = soft-target policy cross-entropy + value MSE + manual L2
(train.py:110-114).  The L2 term reproduces the reference's actual behavior:
it intends to skip bias and LayerNorm parameters, but torch names contain
neither "LayerNorm" nor match LN scale — so in practice only parameters
literally named "bias" are excluded (train.py:104-108); we exclude leaves
named 'bias' and include everything else (kernels, LN scales, embeddings).

The optimizer is Adam, re-created fresh each outer iteration exactly like
the reference (train.py:92 constructs a new torch.optim.Adam per train()
call, resetting the moments).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from alphazero_tpu.config import TrainConfig
from alphazero_tpu.data.replay import ReplayBuffer, sample


class TrainMetrics(NamedTuple):
    loss: jax.Array
    policy_loss: jax.Array
    value_loss: jax.Array
    l2: jax.Array


def l2_penalty(params) -> jax.Array:
    """Σ w² over all parameters except biases (train.py:101-108)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "bias":
            continue
        total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return total


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.learning_rate)


def loss_fn(model, params, obs, policy_target, value_target,
            l2_coeff: float, dropout_rng=None) -> Tuple[jax.Array,
                                                        TrainMetrics]:
    """Training loss.  ``dropout_rng`` enables stochastic regularization —
    the reference trains with dropout ACTIVE (``model.train()``,
    train.py:92; Dropout(0.1) in ai/nn.py:44,58) and evaluates in eval
    mode; families without Dropout modules (dense/resnet) ignore the rng."""
    if dropout_rng is None:
        logits, value = model.apply({"params": params}, obs,
                                    deterministic=True)
    else:
        logits, value = model.apply({"params": params}, obs,
                                    deterministic=False,
                                    rngs={"dropout": dropout_rng})
    logp = jax.nn.log_softmax(logits, axis=-1)
    policy_loss = jnp.mean(jnp.sum(-policy_target * logp, axis=-1))
    value_loss = jnp.mean((value - value_target) ** 2)
    l2 = l2_penalty(params)
    loss = policy_loss + value_loss + l2_coeff * l2
    return loss, TrainMetrics(loss, policy_loss, value_loss, l2)


def make_train_step(model, cfg: TrainConfig, syms=None,
                    augment_skip: int = 0) -> Callable:
    """Jittable ``(params, opt_state, buffer, rng) -> (params, opt_state,
    metrics)`` doing one Adam step on a uniform replay sample.

    ``syms``/``augment_skip``: sample-time symmetry augmentation — the
    reference's buffer-write-time 8-fold orbit (train.py:30-49) applied at
    read time instead (distributionally identical, data/replay.py)."""
    opt = make_optimizer(cfg)

    def train_step(params, opt_state, buffer: ReplayBuffer, rng):
        rng_s, rng_d = jax.random.split(rng)
        obs, pol, val = sample(buffer, rng_s, cfg.batch_size, syms,
                               augment_skip)
        grads, metrics = jax.grad(
            lambda p: loss_fn(model, p, obs, pol, val, cfg.l2_coeff,
                              dropout_rng=rng_d),
            has_aux=True,
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_train_epoch(model, cfg: TrainConfig, num_steps: int,
                     donate: bool = True, syms=None,
                     augment_skip: int = 0) -> Callable:
    """Jitted scan of up to ``num_steps`` train steps (the reference's
    ``train_iterations = buffer//batch`` inner loop, train.py:95).

    ``num_active`` (a dynamic scalar ≤ ``num_steps``) masks the tail of the
    scan so a schedule that computes e.g. 1 SGD step performs exactly 1 —
    the fixed scan length keeps ONE compilation while steps beyond
    ``num_active`` leave params/optimizer untouched.  Metrics average over
    the active steps only."""
    step = make_train_step(model, cfg, syms, augment_skip)

    def epoch(params, opt_state, buffer: ReplayBuffer, rng, num_active):
        def body(carry, i):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            new_p, new_o, metrics = step(params, opt_state, buffer, k)
            active = i < num_active
            params = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_p, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_o, opt_state)
            metrics = jax.tree.map(
                lambda m: jnp.where(active, m, 0.0), metrics)
            return (params, opt_state, rng), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, rng), jnp.arange(num_steps)
        )
        # mean over the ACTIVE steps (inactive rows were zeroed)
        denom = jnp.maximum(num_active, 1).astype(jnp.float32)
        mean_metrics = jax.tree.map(lambda m: jnp.sum(m) / denom, metrics)
        return params, opt_state, mean_metrics

    return jax.jit(epoch, donate_argnums=(0, 1) if donate else ())

"""Sharded actor-learner super-step.

One jitted SPMD program per outer chunk: K lockstep self-play moves for the
sharded game batch (actors data-parallel over 'data', network optionally
tensor-parallel over 'model') followed by M SGD steps whose batch is
sharded over 'data' — the gradient all-reduce is inserted by XLA.

This is the multi-chip form of the reference's sequential
collect_data → train alternation (main.py:33-44), with the process/device
boundaries replaced by shardings (SURVEY.md §2.3 actor/learner row)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alphazero_tpu.config import Config
from alphazero_tpu.data.replay import ReplayBuffer, sample
from alphazero_tpu.parallel.mesh import (
    batch_pytree_sharding, data_sharded, replicated,
    replicated_param_sharding, vit_param_sharding,
)
from alphazero_tpu.training.learner import loss_fn, make_optimizer
from alphazero_tpu.training.selfplay import (SelfPlayState,
                                             selfplay_chunk_fused,
                                             selfplay_step)
from alphazero_tpu.data.augment import Symmetries


def _sp_partition_specs(sp: SelfPlayState, batch: int):
    """PartitionSpec tree for a SelfPlayState: game-batch leaves shard over
    'data', counters/rng replicate."""
    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == batch:
            return P("data")
        return P()
    return jax.tree.map(spec, sp)


def make_sharded_selfplay(env, model, cfg: Config, mesh: Mesh,
                          num_steps: int, interpret: bool = False):
    """``shard_map``'d whole-chunk fused self-play over the 'data' axis:
    each shard runs the multi-move Pallas chunk kernel
    (search/pallas_fused.py) on ITS slice of the game batch and writes into
    ITS replay-buffer ring — the per-chip fast path and the mesh compose
    instead of falling back to the XLA engine (SURVEY §2.3 actor/learner
    row).  Requires a sharded buffer (create_sharded) with one ring per
    'data' shard.

    Counters (games_done/env_steps/results) psum over 'data' so they stay
    replicated global totals; the consumed RNG is folded with the shard
    index (distinct Dirichlet noise per shard), while the carried
    ``sp.rng`` advances identically on every shard.

    ``interpret=True`` runs the kernel in interpret mode — the CPU-mesh
    form the multichip dryrun and tests exercise."""
    from jax import shard_map

    syms = Symmetries(env)
    n_data = mesh.shape["data"]

    def local(params, sp: SelfPlayState, buffer: ReplayBuffer):
        idx = jax.lax.axis_index("data")
        # one ring per shard: drop the shard dim for the flat-buffer ops
        buf_local = jax.tree.map(lambda x: jnp.squeeze(x, 0), buffer)
        rng_use = jax.random.fold_in(sp.rng, idx)
        rng_next = jax.random.split(sp.rng)[0]      # same on every shard
        g0, e0, r0 = sp.games_done, sp.env_steps, sp.results
        sp2, buf2 = selfplay_chunk_fused(
            env, model, params, cfg.mcts, cfg.replay, syms,
            sp.replace(rng=rng_use), buf_local, num_steps,
            interpret=interpret)
        sp_out = sp2.replace(
            rng=rng_next,
            games_done=g0 + jax.lax.psum(sp2.games_done - g0, "data"),
            env_steps=e0 + jax.lax.psum(sp2.env_steps - e0, "data"),
            results=r0 + jax.lax.psum(sp2.results - r0, "data"),
        )
        return sp_out, jax.tree.map(lambda x: x[None], buf2)

    def run(params, sp: SelfPlayState, buffer: ReplayBuffer):
        B = sp.t.shape[0]
        assert (B // n_data) % 128 == 0 or interpret, (B, n_data)
        sp_specs = _sp_partition_specs(sp, B)
        buf_specs = jax.tree.map(lambda _: P("data"), buffer)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), sp_specs, buf_specs),
            out_specs=(sp_specs, buf_specs),
            check_vma=False,
        )(params, sp, buffer)

    return run


def buffer_ready(buffer: ReplayBuffer):
    """Warm-up gate: True once EVERY shard's ring holds at least one game.
    Training earlier would dilute batches with all-zero rows from empty
    shards (data/replay.py sample warm-up note)."""
    return jnp.min(buffer.size) > 0


def make_collect_chunk(env, model, cfg: Config, mesh: Mesh, num_steps: int,
                       tensor_parallel: Optional[bool] = None,
                       fused_selfplay: Optional[bool] = None,
                       interpret: bool = False) -> Callable:
    """Build the actor phase as its own program over ``mesh``:
    ``collect(params, sp, buffer) -> (sp, buffer)`` — K lockstep self-play
    moves for the sharded game batch, writes into the sharded buffer.

    Same auto-detection as :func:`make_super_step`: the dense family rides
    the shard_map'd whole-chunk Pallas kernel, other families scan the
    per-move batched search with the flax forward (optionally
    tensor-parallel over 'model')."""
    if tensor_parallel is None:
        tensor_parallel = (cfg.model.family == "vit"
                           and mesh.shape["model"] > 1)
    if fused_selfplay is None:
        from alphazero_tpu.search.pallas_fused import supports_selfplay_fused
        B_local = cfg.train.selfplay_batch // mesh.shape["data"]
        # interpret=True (CPU-mesh tests/dryruns) keeps the semantic gates
        # but relaxes VMEM/platform — the predicate itself owns that split
        fused_selfplay = (not tensor_parallel
                          and supports_selfplay_fused(env, B_local,
                                                      cfg.mcts, model,
                                                      interpret=interpret))
    if fused_selfplay:
        return make_sharded_selfplay(env, model, cfg, mesh, num_steps,
                                     interpret=interpret)
    syms = Symmetries(env)

    def collect(params, sp: SelfPlayState, buffer: ReplayBuffer):
        def eval_fn(obs):
            logits, value = model.apply({"params": params}, obs,
                                        deterministic=True)
            return jax.nn.softmax(logits, axis=-1), value

        def body(carry, _):
            sp, buffer = carry
            sp, buffer = selfplay_step(env, eval_fn, cfg.mcts, cfg.replay,
                                       syms, sp, buffer)
            return (sp, buffer), None

        (sp, buffer), _ = jax.lax.scan(body, (sp, buffer), None,
                                       length=num_steps)
        return sp, buffer

    return collect


def make_train_chunk(env, model, cfg: Config, mesh: Mesh,
                     num_steps: int) -> Callable:
    """Build the learner phase as its own program over ``mesh``:
    ``train(params, opt_state, buffer, rng) -> (params, opt_state, rng,
    metrics, trained)`` — ``num_steps`` data-parallel SGD steps whose batch
    shards over 'data' (gradient psum inserted by XLA).

    Unlike the fused super-step, the optimizer state is threaded through so
    an epoch of many chunks keeps ONE fresh-Adam state (the reference's
    per-epoch reset, train.py:92).  The whole chunk no-ops (``trained`` =
    False, zero metrics) until :func:`buffer_ready` — the warm-up gate.
    ``num_active`` (dynamic scalar ≤ ``num_steps``) masks the scan tail so
    partial epochs perform exactly the scheduled step count."""
    from alphazero_tpu.training.learner import TrainMetrics
    syms = Symmetries(env)
    opt = make_optimizer(cfg.train)
    dsh = data_sharded(mesh)

    def train(params, opt_state, buffer: ReplayBuffer, rng, num_active):
        def tr_body(carry, i):
            params, opt_state, rng = carry
            rng, k, kd = jax.random.split(rng, 3)
            obs, pol, val = sample(
                buffer, k, cfg.train.batch_size,
                syms if cfg.replay.augment else None,
                cfg.replay.augment_skip_moves)
            obs = jax.lax.with_sharding_constraint(obs, dsh)
            pol = jax.lax.with_sharding_constraint(pol, dsh)
            val = jax.lax.with_sharding_constraint(val, dsh)
            grads, metrics = jax.grad(
                lambda p: loss_fn(model, p, obs, pol, val,
                                  cfg.train.l2_coeff, dropout_rng=kd),
                has_aux=True,
            )(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            import optax
            new_p = optax.apply_updates(params, updates)
            active = i < num_active
            params = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_p, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_opt, opt_state)
            metrics = jax.tree.map(
                lambda m: jnp.where(active, m, 0.0), metrics)
            return (params, opt_state, rng), metrics

        ready = (buffer_ready(buffer) if buffer.cursor.ndim == 1
                 else buffer.size > 0)

        def do(carry):
            return jax.lax.scan(tr_body, carry, jnp.arange(num_steps))

        def skip(carry):
            zeros = TrainMetrics(*(jnp.zeros((num_steps,), jnp.float32)
                                   for _ in range(4)))
            return carry, zeros

        (params, opt_state, rng), metrics = jax.lax.cond(
            ready, do, skip, (params, opt_state, rng))
        denom = jnp.maximum(num_active, 1).astype(jnp.float32)
        return (params, opt_state, rng,
                jax.tree.map(lambda m: jnp.sum(m) / denom, metrics), ready)

    return train


def make_super_step(env, model, cfg: Config, mesh: Mesh,
                    selfplay_steps: int, train_steps: int,
                    tensor_parallel: Optional[bool] = None,
                    fused_selfplay: Optional[bool] = None,
                    interpret: bool = False) -> Callable:
    """Build ``super_step(params, sp, buffer, rng) ->
    (params, sp, buffer, rng, metrics)`` jitted over ``mesh``.

    The optimizer state is created inside (fresh Adam per epoch — the
    reference's semantics, train.py:92), so only params/sp/buffer shard.

    ``fused_selfplay`` (default: auto-detect) runs the actor phase through
    the shard_map'd whole-chunk Pallas kernel (make_sharded_selfplay) —
    the flagship fast path under the mesh.  Requires the dense family, a
    lane-aligned per-shard batch, and no tensor parallelism.
    """
    if tensor_parallel is None:
        tensor_parallel = (cfg.model.family == "vit"
                           and mesh.shape["model"] > 1)
    if fused_selfplay is None:
        from alphazero_tpu.search.pallas_fused import supports_selfplay_fused
        B_local = cfg.train.selfplay_batch // mesh.shape["data"]
        fused_selfplay = (not tensor_parallel
                          and supports_selfplay_fused(env, B_local, cfg.mcts,
                                                      model))
    sharded_sp = (make_sharded_selfplay(env, model, cfg, mesh,
                                        selfplay_steps, interpret=interpret)
                  if fused_selfplay else None)
    syms = Symmetries(env)
    opt = make_optimizer(cfg.train)
    dsh = data_sharded(mesh)

    def super_step(params, sp: SelfPlayState, buffer: ReplayBuffer, rng):
        # plain flax eval here: a pallas_call cannot be auto-partitioned by
        # XLA over the mesh — the fused engines enter the SPMD program only
        # under shard_map (make_sharded_selfplay below), never via this fn
        def eval_fn(obs):
            logits, value = model.apply({"params": params}, obs,
                                        deterministic=True)
            return jax.nn.softmax(logits, axis=-1), value

        # ---- actors: K lockstep moves over the sharded game batch
        if sharded_sp is not None:
            sp, buffer = sharded_sp(params, sp, buffer)
        else:
            def sp_body(carry, _):
                sp, buffer = carry
                sp, buffer = selfplay_step(env, eval_fn, cfg.mcts,
                                           cfg.replay, syms, sp, buffer)
                return (sp, buffer), None

            (sp, buffer), _ = jax.lax.scan(sp_body, (sp, buffer), None,
                                           length=selfplay_steps)

        # ---- learner: M data-parallel SGD steps
        opt_state = opt.init(params)

        def tr_body(carry, _):
            params, opt_state, rng = carry
            rng, k, kd = jax.random.split(rng, 3)
            obs, pol, val = sample(
                buffer, k, cfg.train.batch_size,
                syms if cfg.replay.augment else None,
                cfg.replay.augment_skip_moves)
            # constrain the batch onto the data axis so the forward/backward
            # run data-parallel and the gradient psum rides ICI
            obs = jax.lax.with_sharding_constraint(obs, dsh)
            pol = jax.lax.with_sharding_constraint(pol, dsh)
            val = jax.lax.with_sharding_constraint(val, dsh)
            grads, metrics = jax.grad(
                lambda p: loss_fn(model, p, obs, pol, val,
                                  cfg.train.l2_coeff, dropout_rng=kd),
                has_aux=True,
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), metrics

        # warm-up gate: skip the learner until every shard's ring holds a
        # game — training earlier dilutes batches with zero rows from
        # still-empty shards (data/replay.py sample warm-up note)
        from alphazero_tpu.training.learner import TrainMetrics
        ready = (buffer_ready(buffer) if buffer.cursor.ndim == 1
                 else buffer.size > 0)

        def do(carry):
            return jax.lax.scan(tr_body, carry, None, length=train_steps)

        def skip(carry):
            zeros = TrainMetrics(*(jnp.zeros((train_steps,), jnp.float32)
                                   for _ in range(4)))
            return carry, zeros

        (params, opt_state, rng), metrics = jax.lax.cond(
            ready, do, skip, (params, opt_state, rng))
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        return params, sp, buffer, rng, mean_metrics

    return super_step


def shardings_for(env, model, cfg: Config, mesh: Mesh, params,
                  sp: SelfPlayState, buffer: ReplayBuffer,
                  tensor_parallel: Optional[bool] = None):
    """(param, sp, buffer, rng) sharding trees for placing the state."""
    if tensor_parallel is None:
        tensor_parallel = (cfg.model.family == "vit"
                           and mesh.shape["model"] > 1)
    p_sh = (vit_param_sharding(params, mesh) if tensor_parallel
            else replicated_param_sharding(params, mesh))
    sp_sh = batch_pytree_sharding(sp, mesh, sp.t.shape[0])
    # sharded buffer (one ring per data shard, data/replay.py
    # create_sharded): every leaf's leading dim is the shard dim — writes
    # and samples stay local, capacity/bandwidth scale with the mesh
    if buffer.cursor.ndim != 1:
        raise ValueError("SPMD super-step needs a sharded buffer; build it "
                         "with create_sharded(env, cap, mesh.shape['data']) "
                         "or convert with to_sharded")
    buf_sh = jax.tree.map(lambda _: data_sharded(mesh), buffer)
    return p_sh, sp_sh, buf_sh, replicated(mesh)


def jit_super_step(env, model, cfg: Config, mesh: Mesh, params, sp, buffer,
                   selfplay_steps: int, train_steps: int,
                   tensor_parallel: Optional[bool] = None):
    """Jit the super-step with explicit in/out shardings and place state.

    A flat (unsharded) ``buffer`` is re-laid out into one ring per data
    shard first (data/replay.py:to_sharded)."""
    from alphazero_tpu.data.replay import to_sharded
    buffer = to_sharded(buffer, mesh.shape["data"])
    fn = make_super_step(env, model, cfg, mesh, selfplay_steps, train_steps,
                         tensor_parallel)
    p_sh, sp_sh, buf_sh, r_sh = shardings_for(
        env, model, cfg, mesh, params, sp, buffer, tensor_parallel
    )
    jitted = jax.jit(
        fn,
        in_shardings=(p_sh, sp_sh, buf_sh, r_sh),
        out_shardings=(p_sh, sp_sh, buf_sh, r_sh, None),
    )
    params = jax.device_put(params, p_sh)
    sp = jax.tree.map(jax.device_put, sp, sp_sh)
    buffer = jax.tree.map(jax.device_put, buffer, buf_sh)
    return jitted, params, sp, buffer

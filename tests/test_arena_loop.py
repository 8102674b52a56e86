"""Arena + outer-loop integration tests (SURVEY.md §4-5)."""

import dataclasses

import jax
import numpy as np

from alphazero_tpu.config import (Config, MCTSConfig, ModelConfig,
                                  ReplayConfig, TrainConfig)
from alphazero_tpu.envs import make_env
from alphazero_tpu.eval.arena import Agent, compare
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.training.loop import Trainer


def _tiny_cfg(**over):
    base = dict(
        env="tictactoe",
        mcts=MCTSConfig(num_simulations=16, temperature_moves=2,
                        dirichlet_alpha=0.35),
        model=ModelConfig(family="resnet", channels=8, blocks=1,
                          compute_dtype="float32"),
        replay=ReplayConfig(capacity=2048),
        train=TrainConfig(batch_size=32, selfplay_batch=16, games_per_iter=16,
                          gate_games=8, gate_enabled=True,
                          train_steps_per_iter=32),
    )
    base.update(over)
    return Config(**base)


def test_arena_stronger_search_wins():
    """More simulations must beat fewer with vanilla agents (strength
    ordering sanity; the reference uses vanilla matches the same way,
    main.py:74-76)."""
    env = make_env("tictactoe")
    strong = Agent(None, MCTSConfig(num_simulations=128, use_dirichlet=False))
    weak = Agent(None, MCTSConfig(num_simulations=4, use_dirichlet=False))
    rate, score = compare(env, strong, weak, games=16,
                          rng=jax.random.PRNGKey(0))
    # contender (weak) must NOT dominate; strong should take the majority
    assert score[0] > score[1], score


def test_arena_self_match_is_balanced():
    env = make_env("tictactoe")
    agent = Agent(None, MCTSConfig(num_simulations=32, use_dirichlet=False))
    rate, score = compare(env, agent, agent, games=16,
                          rng=jax.random.PRNGKey(1))
    assert 0.0 <= rate <= 1.0
    assert score[0] + score[1] == 16.0  # draws split evenly


def test_trainer_iteration_end_to_end(tmp_path):
    cfg = _tiny_cfg()
    tr = Trainer(cfg, workdir=str(tmp_path))
    m = tr.iterate(vanilla_eval=False)
    assert m["games"] >= cfg.train.games_per_iter
    assert np.isfinite(m["loss"])
    assert m["buffer_size"] > 0
    assert m["accepted"] in (True, False)

    # gating bookkeeping: rejection reverts params, acceptance promotes
    if m["accepted"]:
        assert tr.version == 1
    else:
        assert tr.reject_count == 1
        a = jax.tree.leaves(tr.params_new)
        b = jax.tree.leaves(tr.params_best)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg(train=TrainConfig(batch_size=32, selfplay_batch=16,
                                      games_per_iter=8, gate_enabled=False,
                                      train_steps_per_iter=32))
    tr = Trainer(cfg, workdir=str(tmp_path))
    tr.iterate(vanilla_eval=False)
    tr.save_checkpoint()

    tr2 = Trainer(cfg, workdir=str(tmp_path))
    assert tr2.restore_checkpoint()
    assert tr2.version == tr.version
    assert int(tr2.buffer.size) == int(tr.buffer.size)
    for x, y in zip(jax.tree.leaves(tr.params_best),
                    jax.tree.leaves(tr2.params_best)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_distributed_initialize_noop():
    """Single-process runs skip jax.distributed (parallel/distributed.py)."""
    from alphazero_tpu.parallel.distributed import initialize, process_info
    assert initialize() is False
    info = process_info()
    assert info["process_count"] == 1 and info["global_devices"] >= 1


def test_buffer_import_and_checkpoint_eval(tmp_path):
    """Cross-run buffer seeding (reference preload, main.py:129) and
    version-vs-version restore (reference eval mode, main.py:181-197)."""
    cfg = _tiny_cfg()
    tr = Trainer(cfg, workdir=str(tmp_path / "a"))
    tr.iterate(vanilla_eval=False)
    assert tr.version >= 0
    tr.save_checkpoint()
    src_size = int(tr.buffer.size)
    assert src_size > 0

    # fresh run seeds its buffer from run a's checkpoint
    tr2 = Trainer(cfg, workdir=str(tmp_path / "b"))
    n = tr2.import_buffer(str(tmp_path / "a"))
    assert n == min(src_size, tr2.buffer.capacity)
    assert int(tr2.buffer.size) == n
    # imported rows can train (reference mode 4: train-only on a preloaded
    # buffer, main.py:212-231)
    m = tr2.train_epoch()
    assert np.isfinite(m["loss"])

    # restore a specific version into a third trainer (eval --vs checkpoint)
    tr3 = Trainer(cfg, workdir=str(tmp_path / "a"))
    assert tr3.restore_checkpoint(step=tr.version)
    assert tr3.version == tr.version


def test_trainer_expand_depth():
    """Trainer.expand_depth grows the ViT in place (CLI --expand-depth):
    existing block params transfer, a new block appears, programs rebuild."""
    cfg = _tiny_cfg(model=ModelConfig(family="vit", embed_dim=16,
                                      patch_size=3, num_heads=2, depth=1,
                                      dropout=0.0, compute_dtype="float32"))
    tr = Trainer(cfg)
    old_block0 = jax.tree.map(np.asarray, tr.params_best["block_0"])
    tr.expand_depth(2)
    assert tr.cfg.model.depth == 2
    assert "block_1" in tr.params_best
    new_block0 = jax.tree.map(np.asarray, tr.params_best["block_0"])
    for a, b in zip(jax.tree.leaves(old_block0), jax.tree.leaves(new_block0)):
        np.testing.assert_array_equal(a, b)
    m = tr.iterate(vanilla_eval=False)   # the rebuilt programs still run
    assert np.isfinite(m["loss"])

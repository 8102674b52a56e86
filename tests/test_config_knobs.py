"""Config-field kernel knobs + CLI overrides (VERDICT r4 #7/#8).

The AZ_* Pallas tuning knobs are MCTSConfig fields (env vars override for
profiling), ``--lr`` reproduces reference train-only mode's 1e-3
(main.py:230), and both round-trip through a run's persisted config.json.
"""

import argparse
import os

import pytest

from alphazero_tpu.config import Config, MCTSConfig, TrainConfig, from_json, to_json
from alphazero_tpu.search.pallas_mcts import _env_knob


def test_env_knob_precedence(monkeypatch):
    monkeypatch.delenv("AZ_TEST_KNOB", raising=False)
    assert _env_knob("AZ_TEST_KNOB", 4) == 4                 # default
    assert _env_knob("AZ_TEST_KNOB", 4, 2) == 2              # config field
    monkeypatch.setenv("AZ_TEST_KNOB", "7")
    assert _env_knob("AZ_TEST_KNOB", 4, 2) == 7              # env wins
    monkeypatch.setenv("AZ_TEST_KNOB", "0")
    assert _env_knob("AZ_TEST_KNOB", 4, 2) == 1              # clamped
    monkeypatch.setenv("AZ_TEST_KNOB", "junk")
    assert _env_knob("AZ_TEST_KNOB", 4, 2) == 2              # bad env → cfg


def test_knob_fields_roundtrip_config_json():
    cfg = Config(
        mcts=MCTSConfig(nseg=6, desc_unroll=3, backup_unroll=1, fwd_nway=4),
        train=TrainConfig(learning_rate=1e-3, selfplay_chunk_steps=8),
    )
    cfg2 = from_json(to_json(cfg))
    assert cfg2.mcts.nseg == 6
    assert cfg2.mcts.desc_unroll == 3
    assert cfg2.mcts.backup_unroll == 1
    assert cfg2.mcts.fwd_nway == 4
    assert cfg2.train.learning_rate == 1e-3
    assert cfg2.train.selfplay_chunk_steps == 8


def test_cli_lr_override():
    from alphazero_tpu.cli import _apply_overrides
    from alphazero_tpu.config import preset

    args = argparse.Namespace(
        games_per_iter=None, selfplay_batch=None, batch_size=None,
        gate_games=None, no_gate=False, sims=None, capacity=None, lr=1e-3)
    cfg = _apply_overrides(preset("connect4"), args)
    assert cfg.train.learning_rate == 1e-3


def test_parse_mesh_validation():
    from alphazero_tpu.cli import _parse_mesh

    assert _parse_mesh("data=8") == (8, 1)
    assert _parse_mesh("data=4,model=2") == (4, 2)
    for bad in ("data=0", "model=2", "data=4,data=8", "data=-1", "data=x"):
        with pytest.raises(SystemExit):
            _parse_mesh(bad)


def test_trainer_chunk_steps_config(monkeypatch):
    """selfplay_chunk_steps flows into the runner build; AZ_CHUNK_STEPS env
    (already folded into the module default) keeps priority."""
    monkeypatch.delenv("AZ_CHUNK_STEPS", raising=False)
    from alphazero_tpu.config import ModelConfig, ReplayConfig
    from alphazero_tpu.training.loop import Trainer

    cfg = Config(
        env="tictactoe",
        mcts=MCTSConfig(num_simulations=4),
        model=ModelConfig(family="dense", width=16, blocks=1,
                          compute_dtype="float32"),
        replay=ReplayConfig(capacity=180),
        train=TrainConfig(batch_size=8, selfplay_batch=8,
                          selfplay_chunk_steps=5),
    )
    tr = Trainer(cfg)
    assert tr._chunk_steps == 5


def test_trainer_persist_config_semantics(tmp_path):
    """TRAIN runs own config.json (a re-train with new settings must
    refresh it or later restores rebuild stale geometry); read-only
    commands (persist_config=False) neither clobber nor fabricate it
    (ADVICE r4)."""
    import dataclasses as dc
    import json

    from alphazero_tpu.config import ModelConfig, ReplayConfig
    from alphazero_tpu.training.loop import Trainer

    cfg = Config(
        env="tictactoe",
        mcts=MCTSConfig(num_simulations=4),
        model=ModelConfig(family="dense", width=16, blocks=1,
                          compute_dtype="float32"),
        replay=ReplayConfig(capacity=180),
        train=TrainConfig(batch_size=8, selfplay_batch=8),
    )
    wd = str(tmp_path / "run")
    Trainer(cfg, workdir=wd)
    assert json.load(open(f"{wd}/config.json"))["model"]["width"] == 16

    # read-only re-open with a different model config: file untouched
    cfg2 = dc.replace(cfg, model=dc.replace(cfg.model, width=32))
    Trainer(cfg2, workdir=wd, persist_config=False)
    assert json.load(open(f"{wd}/config.json"))["model"]["width"] == 16

    # a new TRAIN run into the same workdir refreshes the config
    Trainer(cfg2, workdir=wd)
    assert json.load(open(f"{wd}/config.json"))["model"]["width"] == 32

    # read-only open of a legacy workdir: nothing fabricated
    wd2 = str(tmp_path / "legacy")
    os.makedirs(wd2)
    Trainer(cfg, workdir=wd2, persist_config=False)
    assert not os.path.exists(f"{wd2}/config.json")


def test_cli_model_shape_overrides():
    from alphazero_tpu.cli import _apply_overrides
    from alphazero_tpu.config import preset

    args = argparse.Namespace(
        games_per_iter=None, selfplay_batch=None, batch_size=None,
        gate_games=None, no_gate=False, sims=None, capacity=None, lr=1e-3,
        model_family="vit", model_embed_dim=256, model_depth=2,
        model_patch_size=3, model_width=None, model_blocks=None,
        model_channels=None)
    cfg = _apply_overrides(preset("connect4"), args)
    assert cfg.model.family == "vit"
    assert cfg.model.embed_dim == 256
    assert cfg.model.depth == 2
    assert cfg.model.patch_size == 3
    assert cfg.model.width == 512          # untouched fields keep preset

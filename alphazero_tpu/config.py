"""Configuration dataclasses.

Replaces the reference's interactive ``input()`` menus and hardcoded literals
(main.py:85-97,123-233; SURVEY.md §5 config row) with a typed config tree and
per-game presets mirroring BASELINE.json's benchmark configs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search hyperparameters.

    ``formula='reference'`` reproduces the reference PUCT exactly:
    ``Q + prior·√N_parent/(n_child+1)`` with no exploration constant
    (utils.py:36-40, SURVEY.md §2.4-4).  ``'alphazero'`` is standard PUCT
    with ``c_puct``.  Vanilla (model-free) search always uses the reference
    UCB1 ``Q + √(2·ln N_parent/(n_child+1))`` (utils.py:38,43).
    """

    num_simulations: int = 100
    formula: str = "reference"  # 'reference' | 'alphazero'
    c_puct: float = 1.25
    dirichlet_eps: float = 0.25   # utils.py:12
    dirichlet_alpha: float = 0.03  # utils.py:12
    use_dirichlet: bool = True
    # Moves before which actions are visit-sampled rather than argmax
    # (gomoku.py:144 uses 8; test.py:87 arena uses 20).
    temperature_moves: int = 8
    # Leaf-batched simulation rounds: K virtual-loss descents share ONE
    # network forward (K·B positions).  1 = exact sequential reference
    # semantics; >1 trades slight selection noise for K× fewer sequential
    # tree updates and MXU-efficient forwards (search/mcts.py
    # _simulate_round).  Network mode only.
    leaf_batch: int = 1
    virtual_loss: float = 1.0
    # --- Pallas kernel tuning (None = tuned auto-default).  These are
    # TRACE-TIME constants baked into the kernel compilation; the AZ_NSEG /
    # AZ_DESC_UNROLL / AZ_BK_UNROLL / AZ_FWD_NWAY env vars override them
    # for ad-hoc profiling (search/pallas_mcts.py:_env_knob precedence:
    # env var > config field > auto).  Measured sweeps: docs/DESIGN.md.
    nseg: Optional[int] = None          # sim-loop segments (tree windows)
    desc_unroll: Optional[int] = None   # descent while_loop unroll
    backup_unroll: Optional[int] = None  # backup while_loop unroll
    fwd_nway: Optional[int] = None      # interleaved forward groups


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Policy/value network.  ``family='vit'`` mirrors ai/nn.py exactly;
    ``'resnet'`` is the conv tower from BASELINE.json's configs."""

    family: str = "vit"  # 'vit' | 'resnet' | 'dense'
    # ViT (reference production config, main.py:134)
    embed_dim: int = 512
    patch_size: int = 5
    num_heads: int = 8
    depth: int = 1
    dropout: float = 0.1
    # ResNet
    channels: int = 64
    blocks: int = 4
    # DenseTower (MXU-native flagship for small boards, models/dense.py)
    width: int = 512
    # Numerics: bfloat16 activations on TPU, float32 params.
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    capacity: int = 100_000        # main.py:127
    # Positions before this move index get 1 (unaugmented) row; later
    # positions get the full symmetry orbit (train.py:39, SURVEY.md §2.4-9).
    augment_skip_moves: int = 2
    augment: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 512          # main.py:153
    learning_rate: float = 2.5e-4  # main.py:43
    l2_coeff: float = 1e-4         # train.py:101
    # SGD steps per outer iteration = buffer_size // batch_size (main.py:35)
    train_steps_per_iter: Optional[int] = None
    # Self-play games per outer iteration (collect_data_iterations)
    games_per_iter: int = 128
    # Parallel self-play games per device batch
    selfplay_batch: int = 256
    # Gating (main.py:48-81 — the reference stubs the gate; we implement it
    # with a flag to disable for reference-parity runs, SURVEY.md §2.4-6)
    gate_enabled: bool = True
    gate_threshold: float = 0.55   # main.py:50
    # 256 keeps each agent's per-move HALF-batch (eval/arena.py plays each
    # agent only on the half of the boards where it is to move) at 128 lanes
    # so the arena still rides the Pallas search path.
    gate_games: int = 256
    # Data-collection doubling after 2 consecutive rejections (main.py:25-28)
    reject_double_after: int = 2
    outer_iterations: int = 1000   # main.py:23
    # Vanilla-MCTS sanity match cadence (main.py:74-76)
    vanilla_eval_every: int = 15
    seed: int = 0
    # Self-play moves per device dispatch (None = training/loop.py's
    # SELFPLAY_CHUNK_STEPS default of 32; AZ_CHUNK_STEPS env overrides)
    selfplay_chunk_steps: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes: game batch + gradients shard over 'data';
    'model' is reserved for tensor-parallel sharding of wide nets."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    env: str = "connect4"
    mcts: MCTSConfig = MCTSConfig()
    model: ModelConfig = ModelConfig()
    replay: ReplayConfig = ReplayConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()


# ------------------------------------------------------------- (de)serialize
# The reference never records a run's model architecture — its eval mode
# relies on the operator re-typing the right Net hyperparameters
# (main.py:181-197).  Persisting the config beside checkpoints lets eval /
# resume rebuild a checkpoint's exact model without guessing.

def to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=1)


def from_json(s: str) -> Config:
    d = json.loads(s)
    return Config(
        env=d["env"],
        mcts=MCTSConfig(**d["mcts"]),
        model=ModelConfig(**d["model"]),
        replay=ReplayConfig(**d["replay"]),
        train=TrainConfig(**d["train"]),
        mesh=MeshConfig(**d.get("mesh", {})),
    )


def save_config(cfg: Config, workdir: str):
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        f.write(to_json(cfg))


def load_config(workdir: str) -> Optional[Config]:
    """The config stored beside a run's checkpoints, or None."""
    path = os.path.join(workdir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return from_json(f.read())


# ---------------------------------------------------------------- presets
# Mirror BASELINE.json's benchmark configs.

def preset(name: str) -> Config:
    presets = {
        # "tictactoe self-play: MCTS 50 sims/move + small conv policy/value
        # net (CPU-runnable)"
        "tictactoe": Config(
            env="tictactoe",
            mcts=MCTSConfig(num_simulations=50, dirichlet_alpha=0.35,
                            temperature_moves=4),
            model=ModelConfig(family="resnet", channels=32, blocks=2),
            train=TrainConfig(batch_size=256, selfplay_batch=256,
                              games_per_iter=256),
            replay=ReplayConfig(capacity=50_000),
        ),
        # "connect4 self-play: MCTS 200 sims/move, batched 512 parallel games"
        # Flagship model: MXU-native dense tower (models/dense.py).
        # blocks=2 (round 4): strength-validated at 256-game evals —
        # 0.045 → 0.855 vs vanilla-400 over 60 iterations, rising
        # monotonically (docs/results/connect4_dense2_training_curve.jsonl)
        # — matching the blocks=3 and conv-ResNet trajectories while
        # cutting the fused kernel's forward: 82.6k vs 71.9k env-steps/s
        # (docs/DESIGN.md).  Self-play rides the whole-move fused kernel
        # (search/pallas_fused.py).
        "connect4": Config(
            env="connect4",
            # nseg=10: carried-state sweep (round 5) — finer sim-loop
            # segmentation beats the auto default 4 once the d2 peel +
            # dead-row backup land (5.88 → 5.67 ms/move at 8; with the
            # pipelined halves 8→5.48, 10→5.43 = 94.4k env-steps/s,
            # 12→5.43 flat)
            mcts=MCTSConfig(num_simulations=200, dirichlet_alpha=0.3,
                            nseg=10),
            model=ModelConfig(family="dense", width=512, blocks=2),
            train=TrainConfig(batch_size=512, selfplay_batch=512,
                              games_per_iter=512),
        ),
        # The conv-ResNet variant of the flagship (kept for comparison /
        # larger boards where convs pay off).  Round-4 measurements
        # (docs/DESIGN.md leaf-batching section): leaf batching is SLOWER
        # at every K, and B=1024 — though +5.5% in a standalone search
        # probe — exceeds the per-sim kernel's scoped-VMEM budget inside
        # the full self-play program (remote-compile failure), so both
        # stay at their round-3 values.
        "connect4-resnet": Config(
            env="connect4",
            mcts=MCTSConfig(num_simulations=200, dirichlet_alpha=0.3),
            model=ModelConfig(family="resnet", channels=64, blocks=4),
            train=TrainConfig(batch_size=512, selfplay_batch=512,
                              games_per_iter=512),
        ),
        # "gomoku 9x9: deeper net, MCTS 400 sims/move" (conv family)
        "gomoku9": Config(
            env="gomoku9",
            mcts=MCTSConfig(num_simulations=400, dirichlet_alpha=0.1),
            model=ModelConfig(family="resnet", channels=128, blocks=8),
            train=TrainConfig(batch_size=512, selfplay_batch=256,
                              games_per_iter=256),
        ),
        # gomoku9 on the MXU-native dense line-feature tower (round 5):
        # rides the fused chunk kernel at A=81 (d0-peel-only tier,
        # _use_d1/_use_d2 gates) — ~9.6-11.8k env-steps/s in the training
        # loop vs the conv tower's 418 — and strength-validated per the
        # dense-family playbook: 0.0 → 0.91 vs vanilla-400 by iteration
        # 10 (docs/results/gomoku9_dense_training_curve.jsonl; the conv
        # curve hit 0.97 at the same point).
        "gomoku9-dense": Config(
            env="gomoku9",
            mcts=MCTSConfig(num_simulations=400, dirichlet_alpha=0.1),
            model=ModelConfig(family="dense", width=512, blocks=2),
            train=TrainConfig(batch_size=512, selfplay_batch=256,
                              games_per_iter=256),
        ),
        # "gomoku 15x15: full-size net, Dirichlet-noise root exploration,
        # large replay buffer"
        "gomoku15": Config(
            env="gomoku15",
            mcts=MCTSConfig(num_simulations=400, dirichlet_alpha=0.03),
            model=ModelConfig(family="resnet", channels=192, blocks=10),
            train=TrainConfig(batch_size=1024, selfplay_batch=256,
                              games_per_iter=256),
            replay=ReplayConfig(capacity=500_000),
        ),
        # Reference-parity config: the exact reference production setup
        # (gomoku 7x7, ViT embed 512 depth 1 patch 5, main.py:134).
        "gomoku7-reference": Config(
            env="gomoku",
            mcts=MCTSConfig(num_simulations=100, formula="reference"),
            model=ModelConfig(family="vit", embed_dim=512, patch_size=5,
                              num_heads=8, depth=1, dropout=0.1),
            train=TrainConfig(batch_size=512, gate_enabled=False),
        ),
    }
    if name not in presets:
        raise ValueError(f"unknown preset {name!r}; have {sorted(presets)}")
    return presets[name]

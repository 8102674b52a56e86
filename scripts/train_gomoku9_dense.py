"""gomoku9 DENSE-tower strength validation (round 5, VERDICT r4 #4).

The dense line-feature tower runs gomoku9 self-play at ~6.3k env-steps/s
on the fused chunk kernel (15x the conv ResNet's 418, d0-peel-only
configuration) — but speed only counts if it LEARNS.  The dense-family
playbook (docs/DESIGN.md): validate vs vanilla-400 before landing any
preset.  The gomoku9-resnet curve reached 0.97 by iteration 10
(docs/results/gomoku9_training_curve.jsonl) — that is the bar.

Usage: python -m scripts.train_gomoku9_dense [iters] [eval_games]
"""
import dataclasses
import json
import sys

import jax

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import MCTSConfig, ModelConfig, preset
from alphazero_tpu.eval.arena import Agent, compare
from alphazero_tpu.models import make_eval_fn
from alphazero_tpu.training.loop import Trainer
from alphazero_tpu.utils.metrics import MetricsLogger

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
EVAL_GAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
WORKDIR = "runs/gomoku9-dense"

cfg = dataclasses.replace(
    preset("gomoku9"),
    model=ModelConfig(family="dense", width=512, blocks=2))
tr = Trainer(cfg, workdir=WORKDIR,
             logger=MetricsLogger(path=f"{WORKDIR}/metrics.jsonl",
                                  stdout=False))
resumed = tr.restore_checkpoint()
print(json.dumps({"resumed": bool(resumed), "version": tr.version}),
      flush=True)


def strength(tag, games=EVAL_GAMES):
    rng = jax.random.PRNGKey(7)
    vanilla = Agent(None, MCTSConfig(num_simulations=400,
                                     use_dirichlet=False))
    agent = Agent(make_eval_fn(tr.model, tr.params_best),
                  dataclasses.replace(cfg.mcts, use_dirichlet=False))
    rate, score = compare(tr.env, vanilla, agent, games, rng, sampling=True,
                          sampling_moves=4)
    print(json.dumps({"tag": tag, "version": tr.version, "games": games,
                      "model_score_vs_vanilla400": rate,
                      "score": score.tolist()}), flush=True)
    return rate


if not resumed:
    strength("untrained")
for i in range(ITERS):
    m = tr.iterate(vanilla_eval=False)
    print(json.dumps({"iter": m["iter"], "version": m["version"],
                      "accepted": m["accepted"],
                      "gate_rate": round(m["gate_rate"], 4),
                      "games": m["games"], "buffer": m["buffer_size"],
                      "env_steps_per_s": round(m["env_steps_per_s"], 1),
                      "loss": round(m["loss"], 4)}), flush=True)
    if (i + 1) % 5 == 0:
        strength(f"iter{i + 1}")
        tr.save_checkpoint()
strength("final")
tr.save_checkpoint()

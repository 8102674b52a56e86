"""Dense blocks 3→2 strength validation + curve-decline investigation.

Round-3 verdict items #1 and #5: the shallower dense config is the named
headline lever (≈ −1.0 ms of the 7.4 ms/move budget, measured 82.6k
env-steps/s vs 71.9k at blocks=3) but must hold the conv ResNet's learning
trajectory before it lands in the `connect4` preset; and the round-3 curve
(0.86@40 → 0.76@60 at 64-game evals, ±0.06 noise at n=64) needs ≥256-game
evals to separate regression from noise.

Usage: python -m scripts.train_dense2 [iters] [blocks]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
WORKDIR = f"runs/c4_dense{BLOCKS}"

cfg = preset("connect4")
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model,
                                                         blocks=BLOCKS))
tr = Trainer(cfg, workdir=WORKDIR,
             logger=MetricsLogger(path=f"{WORKDIR}/metrics.jsonl",
                                  stdout=False))
resumed = tr.restore_checkpoint()
print(json.dumps({"resumed": bool(resumed), "version": tr.version,
                  "blocks": BLOCKS}), flush=True)


def strength(tag, games=256):
    """vs vanilla-400 at n=256 (binomial sd ≈ 0.025 at p≈0.8 — resolves
    the 0.76-vs-0.86 question the 64-game evals could not)."""
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
                      "buffer": m["buffer_size"],
                      "loss": round(m["loss"], 4)}), flush=True)
    if (i + 1) % 10 == 0:
        strength(f"iter{i + 1}")
        tr.save_checkpoint()
strength("final")
tr.save_checkpoint()

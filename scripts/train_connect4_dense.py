"""Connect4 training validation for the MXU-native dense tower
(models/dense.py) — must reproduce the conv ResNet's learning trajectory
(runs/c4: 0.008 → 0.86 vs vanilla-400 in 60 gated iterations)."""
import dataclasses, json
import jax
from alphazero_tpu.config import preset, MCTSConfig, ModelConfig
from alphazero_tpu.eval.arena import Agent, compare
from alphazero_tpu.models import make_eval_fn
from alphazero_tpu.training.loop import Trainer
from alphazero_tpu.utils.metrics import MetricsLogger

cfg = preset("connect4")
cfg = dataclasses.replace(cfg, model=ModelConfig(family="dense", width=512,
                                                 blocks=3))
tr = Trainer(cfg, workdir="runs/c4_dense",
             logger=MetricsLogger(path="runs/c4_dense/metrics.jsonl"))
resumed = tr.restore_checkpoint()
print(json.dumps({"resumed": bool(resumed), "version": tr.version}), flush=True)

def strength(tag, games=64):
    rng = jax.random.PRNGKey(7)
    vanilla = Agent(None, MCTSConfig(num_simulations=400, use_dirichlet=False))
    agent = Agent(make_eval_fn(tr.model, tr.params_best),
                  dataclasses.replace(cfg.mcts, use_dirichlet=False))
    rate, score = compare(tr.env, vanilla, agent, games, rng, sampling=True,
                          sampling_moves=4)
    print(json.dumps({"tag": tag, "version": tr.version,
                      "model_score_vs_vanilla400": rate,
                      "score": score.tolist()}), flush=True)

if not resumed:
    strength("untrained")
for i in range(60):
    tr.iterate(vanilla_eval=False)
    if (i + 1) % 10 == 0:
        strength(f"iter{i+1}")
        tr.save_checkpoint()
strength("final")
tr.save_checkpoint()

"""Train-to-strength validation (SURVEY.md §4-5): tictactoe self-play
training must beat vanilla-rollout MCTS."""
import dataclasses, json
import jax
from alphazero_tpu.config import preset, MCTSConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.eval.arena import Agent, compare
from alphazero_tpu.models import make_eval_fn
from alphazero_tpu.training.loop import Trainer
from alphazero_tpu.utils.metrics import MetricsLogger

cfg = preset("tictactoe")
cfg = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, games_per_iter=512, gate_enabled=False))
tr = Trainer(cfg, workdir="runs/ttt_validate",
             logger=MetricsLogger(path="runs/ttt_validate/metrics.jsonl"))

def strength(tag):
    rng = jax.random.PRNGKey(123)
    vanilla = Agent(None, MCTSConfig(num_simulations=200, use_dirichlet=False))
    model_agent = Agent(make_eval_fn(tr.model, tr.params_best),
                        dataclasses.replace(cfg.mcts, use_dirichlet=False))
    rate, score = compare(tr.env, vanilla, model_agent, 64, rng, sampling=True,
                          sampling_moves=2)
    print(json.dumps({"checkpoint": tag, "model_score_vs_vanilla200": rate,
                      "score": score.tolist()}), flush=True)
    return rate

r0 = strength("untrained")
for i in range(6):
    tr.iterate(vanilla_eval=False)
rN = strength("trained")
print(json.dumps({"result": "PASS" if rN > max(0.5, r0) else "WEAK",
                  "untrained": r0, "trained": rN}), flush=True)

"""gomoku9 with the DENSE tower: throughput probe (round 5, VERDICT r4 #4).

gomoku9's conv ResNet-128x8 runs forward-bound at 418 env-steps/s (33-53%
conv MXU).  The dense family's line-feature tower costs ~20x fewer FLOPs
and rides the whole-chunk fused kernel (A=81 stays under the packed-edge
and VMEM budgets; the d=2 peel auto-disables at A>16).  This measures the
candidate's speed; strength must clear >=0.9 vs vanilla-400 before any
preset lands (the dense-family playbook, docs/DESIGN.md).

Run: python -m scripts.prof_gomoku_dense [fused|xla] [width] [blocks]
"""
import sys
sys.path.insert(0, "/root/repo")

import os
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
width = int(sys.argv[2]) if len(sys.argv) > 2 else 512
blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 2
game = sys.argv[4] if len(sys.argv) > 4 else "gomoku9"
if mode == "xla":
    os.environ["AZ_DISABLE_CHUNK"] = "1"

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import MCTSConfig, ModelConfig, ReplayConfig, preset
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner

base = preset(game)
env = make_env(base.env)
mcfg = ModelConfig(family="dense", width=width, blocks=blocks)
model = build_model(mcfg, env)
params = init_params(model, env, jax.random.PRNGKey(0))
# gomoku15's A=225 tree only fits scoped VMEM at B=128 (d0-peel only)
B = 128 if env.rows * env.cols > 100 else 256
M = 4

runner = make_selfplay_runner(env, model, base.mcts, base.replay,
                              num_steps=M, donate=False)
sp = init_selfplay(env, B, jax.random.PRNGKey(1))
buf = create(env, base.replay.capacity)
t0 = time.perf_counter()
sp, buf = runner(params, sp, buf)
int(sp.games_done)
print(f"[{mode} w={width} b={blocks}] compile+first "
      f"{time.perf_counter()-t0:.1f}s", flush=True)
sp, buf = runner(params, sp, buf)
int(sp.games_done)
t0 = time.perf_counter()
n = 4
for _ in range(n):
    sp, buf = runner(params, sp, buf)
int(sp.games_done)
dt = (time.perf_counter() - t0) / (n * M)
print(f"[{mode} w={width} b={blocks}] {dt*1e3:.2f} ms/move -> "
      f"{B/dt:,.0f} env-steps/s", flush=True)

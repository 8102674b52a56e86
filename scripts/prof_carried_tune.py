"""Knob sweep on CARRIED game state (round 5).

Round-4 tuning measured fresh-state chunks; real self-play runs on carried
mid-game states whose deeper trees raise the descent/backup while-loop trip
counts (measured: 5.26 fresh vs 6.12+ carried ms/move).  Re-tune the
trace-time knobs at the production operating point.

Run: python -m scripts.prof_carried_tune [knob=value ...]
Each invocation measures ONE knob combination (trace-time constants bake at
first compile, so combinations need fresh processes).
"""
import sys
sys.path.insert(0, "/root/repo")

import os
import time

for arg in sys.argv[1:]:
    k, _, v = arg.partition("=")
    os.environ[k] = v

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner

cfg = preset("connect4")
env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
M, B = 32, 512

runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                              num_steps=M, donate=False)
sp = init_selfplay(env, B, jax.random.PRNGKey(1))
buf = create(env, cfg.replay.capacity)
t0 = time.perf_counter()
sp, buf = runner(params, sp, buf)
int(sp.games_done)
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
sp, buf = runner(params, sp, buf)
int(sp.games_done)

t0 = time.perf_counter()
for _ in range(6):
    sp, buf = runner(params, sp, buf)
int(sp.games_done)
dt = (time.perf_counter() - t0) / (6 * M)
tag = ",".join(sys.argv[1:]) or "defaults"
print(f"[{tag}] {dt*1e3:.3f} ms/move -> {B/dt:,.0f} env-steps/s", flush=True)

"""Tune the chunk kernel's loop knobs on-chip: descent unroll, backup
unroll, sim-loop segmentation.  Timing ends in a host value fetch (the
axon IFRT proxy does not block in block_until_ready — docs/DESIGN.md)."""
import os
import subprocess
import sys

CASES = [
    {"AZ_DESC_UNROLL": "2"},
    {"AZ_DESC_UNROLL": "3"},
    {"AZ_DESC_UNROLL": "1"},
    {"AZ_DESC_UNROLL": "2", "AZ_NSEG": "6"},
    {"AZ_DESC_UNROLL": "2", "AZ_BK_UNROLL": "3"},
    {"AZ_DESC_UNROLL": "2"},
]

BODY = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.search import pallas_fused as F

cfg = preset("connect4")
env = make_env(cfg.env)
B, M = 512, 32
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
players = jnp.zeros((B,), jnp.int32)
mc = jnp.zeros((B,), jnp.int32)

@jax.jit
def step(rng):
    r = F.run_selfplay_chunk_fused(env, model, params, boards, players,
                                   mc, rng, cfg.mcts, M)
    return r["policy"].sum()

t0 = time.perf_counter()
float(step(jax.random.PRNGKey(0)))
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
n = 4
for i in range(n):
    s = float(step(jax.random.PRNGKey(i)))
dt = (time.perf_counter() - t0) / n / M
print(f"RESULT {dt*1e3:.3f} ms/move  {B/dt:,.0f} steps/s", flush=True)
"""

for case in CASES:
    env = dict(os.environ, **case)
    tag = ",".join(f"{k}={v}" for k, v in case.items()) or "defaults"
    r = subprocess.run([sys.executable, "-c", BODY], env=env,
                       capture_output=True, text=True, timeout=900)
    out = [l for l in r.stdout.splitlines() if l.startswith(("RESULT",
                                                             "compile"))]
    print(f"[{tag}] {' | '.join(out) if out else 'FAILED'}")
    if r.returncode != 0 and not out:
        print(r.stderr[-400:])

"""Headline benchmark: connect4 self-play throughput on one chip.

BASELINE.json config: "connect4 self-play: MCTS 200 sims/move, batched 512
parallel games".  Measures env-steps/s (one env step = one completed move of
one game, each costing a full 200-simulation batched MCTS) on the default
JAX device and prints ONE JSON line.

Target (north star): 100,000 env-steps/s per TPU v5e chip.
"""

from __future__ import annotations

import json
import time

import jax


def main():
    from alphazero_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from alphazero_tpu.config import preset
    from alphazero_tpu.data import create
    from alphazero_tpu.envs import make_env
    from alphazero_tpu.models import build_model, init_params
    from alphazero_tpu.training.selfplay import (init_selfplay,
                                                 make_selfplay_runner)

    cfg = preset("connect4")
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))

    B = cfg.train.selfplay_batch          # 512 parallel games
    steps_per_chunk = 8
    runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                  num_steps=steps_per_chunk, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    buffer = create(env, cfg.replay.capacity)

    # warmup / compile
    sp, buffer = runner(params, sp, buffer)
    jax.block_until_ready(sp.env_steps)

    chunks = 6
    t0 = time.perf_counter()
    for _ in range(chunks):
        sp, buffer = runner(params, sp, buffer)
    jax.block_until_ready(sp.env_steps)
    dt = time.perf_counter() - t0

    env_steps = chunks * steps_per_chunk * B
    steps_per_s = env_steps / dt
    baseline = 100_000.0  # north-star target, BASELINE.json
    print(json.dumps({
        "metric": "connect4_selfplay_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()

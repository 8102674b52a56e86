"""Benchmarks: self-play throughput for every BASELINE.json config.

Prints one JSON line per benchmark config (tictactoe, connect4,
connect4-resnet, gomoku9, gomoku15) with env-steps/s, sims/s and model
FLOP/s, then the HEADLINE line last — connect4 self-play (MCTS 200
sims/move, 512 parallel games), the driver-parsed metric:

  {"metric": "connect4_selfplay_env_steps_per_s", "value": N, ...}

Target (north star): 100,000 env-steps/s per TPU v5e chip (BASELINE.md).
A wall-clock budget (AZ_BENCH_BUDGET_S, default 900) guards the secondary
configs: whatever doesn't fit is reported as skipped, and the headline is
always printed (it runs first).
"""

from __future__ import annotations

import json
import os
import time

import jax


def _model_flops_per_pos(cfg, env) -> float:
    """Rough forward FLOPs per position (matmul/conv MACs × 2)."""
    m = cfg.model
    RC = env.rows * env.cols
    if m.family == "dense":
        lines = 0
        from alphazero_tpu.envs.core import _make_line_matrix
        L = _make_line_matrix(env.rows, env.cols, env.win_len).shape[1]
        d_in = env.feature_dim * RC + 2 * L
        f = d_in * m.width + 2 * m.blocks * m.width * m.width \
            + m.width * (env.action_dim + m.width // 4)
        return 2.0 * f
    if m.family == "resnet":
        f = 9 * env.feature_dim * m.channels * RC \
            + m.blocks * 2 * 9 * m.channels * m.channels * RC \
            + 2 * m.channels * RC + 32 * RC
        return 2.0 * f
    # vit
    E, D = m.embed_dim, m.depth
    T = RC + 1
    f = (m.patch_size ** 2) * env.feature_dim * E * RC \
        + D * (4 * E * E * T + 2 * T * T * E + 8 * E * E * T)
    return 2.0 * f


def bench_config(name: str, steps_per_chunk: int, chunks: int,
                 batch_override=None):
    from alphazero_tpu.config import preset
    from alphazero_tpu.data import create
    from alphazero_tpu.envs import make_env
    from alphazero_tpu.models import build_model, init_params
    from alphazero_tpu.training.selfplay import (init_selfplay,
                                                 make_selfplay_runner)

    cfg = preset(name)
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))

    B = batch_override or cfg.train.selfplay_batch
    runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                  num_steps=steps_per_chunk, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    buffer = create(env, cfg.replay.capacity)

    # warmup / compile.  NOTE: timing must end with a HOST FETCH — through
    # this environment's IFRT proxy, block_until_ready returns before
    # remote execution completes; int() forces a value round-trip.
    sp, buffer = runner(params, sp, buffer)
    int(sp.games_done)

    # ≥3 timed windows, report the MEDIAN (VERDICT r4 weak #5: one window
    # was within run-to-run variance of the docs' number; the median plus
    # spread makes the headline stable and honest)
    reps = 3
    rates, total = [], 0.0
    env_steps = chunks * steps_per_chunk * B
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chunks):
            sp, buffer = runner(params, sp, buffer)
        int(sp.games_done)
        dt = time.perf_counter() - t0
        rates.append(env_steps / dt)
        total += dt
    rates.sort()
    steps_per_s = rates[reps // 2]
    flops = _model_flops_per_pos(cfg, env)
    sims_per_s = steps_per_s * cfg.mcts.num_simulations
    return {
        "config": name,
        "env_steps_per_s": round(steps_per_s, 1),
        "spread_env_steps_per_s": [round(rates[0], 1), round(rates[-1], 1)],
        "sims_per_s": round(sims_per_s, 1),
        "batch": B,
        "sims_per_move": cfg.mcts.num_simulations,
        "model_tflops_per_s": round(sims_per_s * flops / 1e12, 2),
        "seconds": round(total, 2),
    }


def main():
    from alphazero_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # 1500 s default: six configs now (gomoku9-dense added round 5); cold
    # compiles through the remote service can eat ~3 min per new program
    # (the persistent cache in ~/.cache makes later runs fit easily)
    budget = float(os.environ.get("AZ_BENCH_BUDGET_S", "1500"))
    only = os.environ.get("AZ_BENCH_CONFIGS")  # comma-separated subset
    t_start = time.perf_counter()

    # headline FIRST so it is always measured within the budget.
    # 6 chunks per window: each window ends with a BLOCKING host fetch
    # (the IFRT-proxy round trip), which the production collect loop
    # pipelines away — longer windows amortize it out of the measurement
    # (3-chunk windows under-read the carried-state rate by ~4%)
    headline = bench_config("connect4", steps_per_chunk=32, chunks=6)
    print(json.dumps(headline), flush=True)

    secondary = [
        ("tictactoe", 32, 3),
        ("connect4-resnet", 8, 3),
        ("gomoku9-dense", 8, 3),
        ("gomoku9", 2, 2),
        ("gomoku15", 1, 2),
    ]
    for name, spc, chunks in secondary:
        if only and name not in only.split(","):
            continue
        if time.perf_counter() - t_start > budget:
            print(json.dumps({"config": name, "skipped": "budget"}),
                  flush=True)
            continue
        try:
            print(json.dumps(bench_config(name, spc, chunks)), flush=True)
        except Exception as e:  # record the failure, keep the headline
            print(json.dumps({"config": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

    baseline = 100_000.0  # north-star target, BASELINE.json
    print(json.dumps({
        "metric": "connect4_selfplay_env_steps_per_s",
        "value": headline["env_steps_per_s"],
        "unit": "env_steps/s",
        "vs_baseline": round(headline["env_steps_per_s"] / baseline, 4),
    }))


if __name__ == "__main__":
    main()

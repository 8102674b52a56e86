"""Data-parallel scaling efficiency on simulated host devices.

The north star asks for ≥80% scaling efficiency from 1 to N hosts
(BASELINE.md).  Real multi-host TPU hardware is not available in this
environment, so this harness measures the SPMD super-step's weak scaling on
N virtual CPU devices (game batch and learner batch sharded over 'data'),
which exercises the identical program/collective structure the TPU pod
slice runs (per-chip throughput is then measured by bench.py).

IMPORTANT CAVEAT (VERDICT r4 #6): this host has TWO physical CPU cores.
N virtual devices time-share them, so measured "efficiency" at N ≥ 4 is
dominated by host-core contention, not by the SPMD program — the numbers
validate program structure (no pathological collective/data-movement
scaling), they do NOT predict pod-slice efficiency.  docs/DESIGN.md
"Parallelism" records the attribution.

Run: python -m scripts.scaling_bench [n_devices ...]
     python -m scripts.scaling_bench --production [n_devices ...]

``--production`` drives the REAL CLI path — SpmdTrainer.collect (the
pipelined host fetch loop) + SpmdTrainer.train_epoch — instead of the raw
super-step, so host-side per-chunk sync costs are included.
"""

import json
import os
import sys
import time


def main(device_counts=(1, 2, 4, 8)):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{max(device_counts)}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from alphazero_tpu.config import (Config, MCTSConfig, ModelConfig,
                                      ReplayConfig, TrainConfig)
    from alphazero_tpu.data import create
    from alphazero_tpu.envs import make_env
    from alphazero_tpu.models import build_model, init_params
    from alphazero_tpu.parallel import jit_super_step, make_mesh
    from alphazero_tpu.training.selfplay import init_selfplay

    per_dev_games = 32
    results = {}
    for n in device_counts:
        cfg = Config(
            env="connect4",
            mcts=MCTSConfig(num_simulations=24, temperature_moves=2),
            model=ModelConfig(family="resnet", channels=16, blocks=2,
                              compute_dtype="float32"),
            replay=ReplayConfig(capacity=8192),
            train=TrainConfig(batch_size=32 * n,
                              selfplay_batch=per_dev_games * n),
        )
        env = make_env(cfg.env)
        model = build_model(cfg.model, env)
        mesh = make_mesh(n_data=n, n_model=1,
                         devices=jax.devices()[:n])
        params = init_params(model, env, jax.random.PRNGKey(0))
        sp = init_selfplay(env, cfg.train.selfplay_batch,
                           jax.random.PRNGKey(1))
        buffer = create(env, cfg.replay.capacity)
        step, params, sp, buffer = jit_super_step(
            env, model, cfg, mesh, params, sp, buffer,
            selfplay_steps=4, train_steps=2)
        rng = jax.random.PRNGKey(2)
        out = step(params, sp, buffer, rng)          # compile+warmup
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = step(params, out[1], out[2], out[3])
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / reps
        steps_per_s = 4 * cfg.train.selfplay_batch / dt
        results[n] = steps_per_s
        print(f"devices={n}: batch={cfg.train.selfplay_batch} "
              f"env_steps/s={steps_per_s:.0f}", file=sys.stderr)

    base = results[device_counts[0]]
    out = {
        "metric": "dp_weak_scaling_efficiency",
        "throughput": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {
            str(k): round(results[k] / (base * k / device_counts[0]), 3)
            for k in device_counts
        },
    }
    print(json.dumps(out))


def main_production(device_counts=(1, 2, 4, 8)):
    """Weak scaling through the production path: SpmdTrainer's jitted
    collect chunks (driven by Trainer.collect's pipelined fetch loop) and
    warm-up-gated train chunks — exactly what `train --mesh data=N` runs."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{max(device_counts)}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.config import (Config, MCTSConfig, ModelConfig,
                                      ReplayConfig, TrainConfig)
    from alphazero_tpu.parallel.mesh import make_mesh
    from alphazero_tpu.training.spmd_loop import SpmdTrainer

    per_dev_games = 16
    results = {}
    for n in device_counts:
        cfg = Config(
            env="connect4",
            mcts=MCTSConfig(num_simulations=24, temperature_moves=2),
            model=ModelConfig(family="resnet", channels=16, blocks=2,
                              compute_dtype="float32"),
            replay=ReplayConfig(capacity=336 * n),
            train=TrainConfig(batch_size=32 * n,
                              selfplay_batch=per_dev_games * n,
                              train_steps_per_iter=8, gate_enabled=False,
                              selfplay_chunk_steps=4),
        )
        mesh = make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
        tr = SpmdTrainer(cfg, mesh=mesh)
        # warmup: one collect chunk + one train epoch (compiles both)
        tr.collect(1)
        tr.train_epoch()
        t0 = time.perf_counter()
        m = tr.collect(2 * per_dev_games * n)
        tm = tr.train_epoch()
        dt = time.perf_counter() - t0
        steps = m["env_steps"]
        results[n] = steps / dt
        print(f"devices={n}: env_steps={steps} collect+train {dt:.2f}s "
              f"-> {results[n]:.0f} env_steps/s", file=sys.stderr)

    base = results[device_counts[0]]
    print(json.dumps({
        "metric": "dp_weak_scaling_efficiency_production",
        "throughput": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {
            str(k): round(results[k] / (base * k / device_counts[0]), 3)
            for k in device_counts
        },
        "note": "2 physical host cores; N>=4 virtual devices time-share "
                "them (see docs/DESIGN.md Parallelism)",
    }))


if __name__ == "__main__":
    args = sys.argv[1:]
    production = "--production" in args
    args = [a for a in args if a != "--production"]
    counts = tuple(int(a) for a in args) or (1, 2, 4, 8)
    (main_production if production else main)(counts)

"""Fused ResNet tower vs the flax/XLA conv forward on the real chip.

Times one inference forward (B = the preset's self-play batch) for each
benchmark resnet config, host-fetch timing.  Drives the
supports_fused_resnet gate: the kernel must BEAT the XLA conv per config.

Usage: python -m scripts.prof_resnet_fwd [tictactoe|connect4-resnet|
                                          gomoku9|gomoku15] ...
"""
import sys
import time

import jax
import jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.ops.pallas_resnet import (_plan_blocks, make_fused_apply,
                                             supports_fused_resnet)


def probe(name, n=20):
    cfg = preset(name)
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    B = cfg.train.selfplay_batch
    obs = (jax.random.uniform(jax.random.PRNGKey(1),
                              (B, env.feature_dim, env.rows, env.cols))
           < 0.2).astype(jnp.float32)
    flops = None
    try:
        import bench
        flops = bench._model_flops_per_pos(cfg, env) * B
    except Exception:
        pass

    K = 10   # forwards chained on-device per dispatch: timing measures
    # device rate, not the ~1.4 ms proxy dispatch latency

    def timeit(tag, f):
        @jax.jit
        def chain(p, o):
            def body(i, o):
                logits, value = f(p, o)
                return o + 0.0 * value.sum()
            return jax.lax.fori_loop(0, K, body, o)

        t0 = time.perf_counter()
        o = chain(params, obs)
        float(o.sum())
        print(f"  [{tag}] compile {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            o = chain(params, o)
        float(o.sum())
        dt = (time.perf_counter() - t0) / (n * K)
        tf = f" = {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
        print(f"  [{tag}] {dt*1e6:,.0f} us/fwd{tf}", flush=True)
        return dt

    print(f"== {name}: C={cfg.model.channels} x{cfg.model.blocks}, B={B}, "
          f"plan={_plan_blocks(B, env.rows*env.cols, env.feature_dim, cfg.model.channels)}, "
          f"supported={supports_fused_resnet(model, B)}", flush=True)

    flax_fwd = jax.jit(lambda p, o: model.apply({"params": p}, o,
                                                deterministic=True))
    timeit("flax", flax_fwd)

    fused = make_fused_apply(env, cfg.model.channels, cfg.model.blocks)
    packed = fused.pack(params)
    fused_fwd = jax.jit(lambda p, o: fused.apply_packed(packed, o))
    timeit("fused", fused_fwd)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["connect4-resnet", "gomoku9"]):
        probe(name)

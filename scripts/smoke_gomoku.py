"""Gomoku self-play smoke on TPU (XLA search path)."""
import dataclasses, time, jax
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.data import create
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner

for preset_name, sims, B in (("gomoku9", 32, 128),):
    cfg = preset(preset_name)
    cfg = dataclasses.replace(
        cfg,
        mcts=dataclasses.replace(cfg.mcts, num_simulations=sims),
        model=dataclasses.replace(cfg.model, channels=32, blocks=2),
        train=dataclasses.replace(cfg.train, selfplay_batch=B))
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                  num_steps=1, donate=False)
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    buf = create(env, 20000)
    t0 = time.time()
    sp, buf = runner(params, sp, buf)
    jax.block_until_ready(sp.env_steps)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        sp, buf = runner(params, sp, buf)
    jax.block_until_ready(sp.env_steps)
    dt = (time.time() - t0) / 3
    print(f"{preset_name}: sims={sims} B={B} compile={compile_t:.0f}s "
          f"steps/s={B/dt:.0f} buffer={int(buf.size)}", flush=True)

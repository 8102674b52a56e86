"""Reference production config smoke: gomoku7 + ViT-512 self-play on TPU."""
import dataclasses, time, jax
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.data import create
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner

cfg = preset("gomoku7-reference")
cfg = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, selfplay_batch=128))
env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                              num_steps=2, donate=False)
sp = init_selfplay(env, 128, jax.random.PRNGKey(1))
buf = create(env, 20000)
t0 = time.time()
sp, buf = runner(params, sp, buf)
jax.block_until_ready(sp.env_steps)
print(f"compile={time.time()-t0:.0f}s", flush=True)
t0 = time.time()
for _ in range(3):
    sp, buf = runner(params, sp, buf)
jax.block_until_ready(sp.env_steps)
dt = (time.time()-t0)/3
print(f"gomoku7-reference (ViT-512, 100 sims, B=128): "
      f"{2*128/dt:.0f} env-steps/s", flush=True)

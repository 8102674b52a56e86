import time, jax, jax.numpy as jnp
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.ops.pallas_resnet import make_fused_apply

cfg = preset("connect4"); env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
obs = jnp.zeros((512, env.feature_dim, 6, 7))
fused = make_fused_apply(env, cfg.model.channels, cfg.model.blocks)

t0 = time.time()
f = jax.jit(lambda p, o: fused(p, o))
out = f(params, obs); jax.block_until_ready(out)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

# correctness vs flax on TPU
ref = model.apply({"params": params}, obs + 0.5, deterministic=True)
got = f(params, obs + 0.5)
import numpy as np
err = np.abs(np.asarray(got[0]) - np.asarray(ref[0])).max()
print(f"max logits err vs flax: {err:.4f}", flush=True)

def scan200(apply):
    def g(p, x):
        def body(i, acc):
            lg, v = apply(p, x + acc*1e-12)
            return acc + v.sum()*1e-9
        return jax.lax.fori_loop(0, 200, body, jnp.float32(0))
    return jax.jit(g)

g = scan200(fused)
o = g(params, obs); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(3): o = g(params, obs)
jax.block_until_ready(o)
print(f"fused eval: {(time.perf_counter()-t0)/3/200*1e6:.0f} us/eval (vs 152 flax)", flush=True)

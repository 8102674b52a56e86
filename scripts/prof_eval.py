"""Eval-net variants: where do the 123us go?"""
import time, jax, jax.numpy as jnp
from flax import linen as nn
from alphazero_tpu.envs import make_env
from alphazero_tpu.config import ModelConfig
from alphazero_tpu.models import build_model, init_params

def timeit(f, *a, n=3):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

env = make_env("connect4")
B = 512
obs = jnp.zeros((B, env.feature_dim, 6, 7))

def scan200(apply):
    def f(x):
        def body(i, acc):
            lg, v = apply(x + acc*1e-12)
            return acc + v.sum()*1e-9
        return jax.lax.fori_loop(0, 200, body, jnp.float32(0))
    return jax.jit(f)

variants = [
    ("resnet64x4 gn bf16", ModelConfig(family="resnet", channels=64, blocks=4)),
    ("resnet64x4 gn f32", ModelConfig(family="resnet", channels=64, blocks=4, compute_dtype="float32")),
    ("resnet32x4 gn bf16", ModelConfig(family="resnet", channels=32, blocks=4)),
    ("resnet128x4 gn bf16", ModelConfig(family="resnet", channels=128, blocks=4)),
]
for name, mc in variants:
    model = build_model(mc, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    ap = lambda x, m=model, p=params: m.apply({"params": p}, x, deterministic=True)
    t = timeit(scan200(ap), obs)
    print(f"{name}: {t/200*1e6:.0f} us/eval")

# no-norm conv tower of same shape (how much is GroupNorm?)
class PlainBlock(nn.Module):
    ch: int
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.ch, (3,3), padding="SAME", use_bias=True, dtype=jnp.bfloat16)(x)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3,3), padding="SAME", use_bias=True, dtype=jnp.bfloat16)(y)
        return nn.relu(x + 0.2*y)

class PlainNet(nn.Module):
    ch: int = 64
    blocks: int = 4
    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x.astype(jnp.bfloat16).transpose(0,2,3,1)
        x = nn.relu(nn.Conv(self.ch, (3,3), padding="SAME", dtype=jnp.bfloat16)(x))
        for _ in range(self.blocks):
            x = PlainBlock(self.ch)(x)
        B = x.shape[0]
        p = nn.relu(nn.Conv(2,(1,1), dtype=jnp.bfloat16)(x)).reshape(B,-1).astype(jnp.float32)
        lg = nn.Dense(7)(p)
        v = nn.relu(nn.Conv(1,(1,1), dtype=jnp.bfloat16)(x)).reshape(B,-1).astype(jnp.float32)
        v = jnp.tanh(nn.Dense(1)(nn.relu(nn.Dense(64)(v))))[:,0]
        return lg, v

pn = PlainNet()
pp = pn.init(jax.random.PRNGKey(0), obs)["params"]
ap = lambda x: pn.apply({"params": pp}, x)
t = timeit(scan200(ap), obs)
print(f"plain64x4 no-norm bf16: {t/200*1e6:.0f} us/eval")

"""Split pallas-path move-step cost: search-only vs eval-only."""
import time, jax, jax.numpy as jnp
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts

def timeit(f, *a, n=3):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

cfg = preset("connect4"); env = make_env(cfg.env)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
B = 512
boards = jnp.zeros((B,2,6,7), jnp.int8)
pl_ = jnp.zeros((B,), jnp.int32); mc = jnp.zeros((B,), jnp.int32)
dones = jnp.zeros((B,), bool)

ev = make_eval_fn(model, params)
def const_eval(o):
    return jnp.full((o.shape[0], 7), 1.0/7), jnp.zeros(o.shape[0])

for name, fn in [("NN", ev), ("const", const_eval)]:
    f = jax.jit(lambda b,p,m,d,r,fn=fn: run_mcts(env, fn, b,p,m,d,r, cfg.mcts).visit_counts)
    t = timeit(f, boards, pl_, mc, dones, jax.random.PRNGKey(1))
    print(f"pallas mcts 200 sims {name}-eval: {t*1e3:.1f} ms ({t/200*1e6:.0f} us/sim)")

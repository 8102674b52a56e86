"""Time descend/update pallas kernels in isolation (200 reps in one jit)."""
import time, jax, jax.numpy as jnp
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.search.pallas_mcts import make_sim_step

def timeit(f, *a, n=3):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

cfg = preset("connect4"); env = make_env(cfg.env)
B, A, RC = 512, 7, 42
N = cfg.mcts.num_simulations + 1
dcap = 43
descend_fn, update_fn = make_sim_step(env, cfg.mcts, B, dcap)

stats = jnp.zeros((3, N, B)).at[0,0].set(1.0).at[2,0].set(1.0)
prior = jnp.full((A, N, B), -1e30).at[:,0,:].set(1.0/7)
children = jnp.full((A, N, B), -1.0)
board = jnp.zeros((2, RC, B))
player = jnp.zeros((1, B), jnp.int32)
mc = jnp.zeros((1, B), jnp.int32)

@jax.jit
def f_desc(stats, prior, children):
    def body(i, acc):
        path, apath, meta, obs, valid, _ = descend_fn(stats + acc*1e-12, prior, children, board, player, mc)
        return acc + meta.sum()*1e-9
    return jax.lax.fori_loop(0, 200, body, jnp.float32(0))

t = timeit(f_desc, stats, prior, children)
print(f"descend x200: {t*1e3:.1f} ms ({t/200*1e6:.0f} us/call)")

path = jnp.full((dcap, B), N, jnp.int32)
meta = jnp.zeros((8, B))
valid = jnp.ones((A, B))
probs = jnp.full((A, B), 1.0/7)
value = jnp.zeros((1, B))

@jax.jit
def f_upd(stats, prior, children):
    def body(i, c):
        s, p, ch = c
        s, p, ch = update_fn(s, p, ch, path, meta, valid, probs, value, i % (N-1) + 1)
        return s, p, ch
    return jax.lax.fori_loop(0, 200, body, (stats, prior, children))

t = timeit(f_upd, stats, prior, children)
print(f"update x200: {t*1e3:.1f} ms ({t/200*1e6:.0f} us/call)")

"""Time each simulation phase in isolation (200 reps inside one jit)."""
import time, functools
import jax, jax.numpy as jnp
from alphazero_tpu.config import preset
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.tree import init_tree
from alphazero_tpu.search import mcts as M
from alphazero_tpu.ops.gather import rows_scatter_add

def timeit(f, *a, n=3):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

cfg = preset("connect4"); env = make_env(cfg.env)
B, S = 512, 200
boards = jnp.zeros((B,2,6,7), jnp.int8)
players = jnp.zeros((B,), jnp.int32); mc = jnp.zeros((B,), jnp.int32)
tree = init_tree(env, boards, players, mc, S)
dcap = 43

def rep200(body):
    def f(x):
        def b(i, c): return body(i, c)
        return jax.lax.fori_loop(0, 200, b, x)
    return jax.jit(f)

# 1. descent alone (on empty tree: stops immediately -> also try deep fake tree)
f = rep200(lambda i, t: (M._descend(t, cfg.mcts, False, dcap)[2].sum().astype(jnp.float32) * 0 + t.stats[0,0,0]).astype(jnp.float32) * 0 + t if False else t)
# simpler: descend and fold depth back into stats so it isn't DCE'd
def desc_body(i, t):
    path, apath, depth, parent, action, child = M._descend(t, cfg.mcts, False, dcap)
    return t.replace(stats=t.stats.at[:, 0, 1].add(depth.astype(t.stats.dtype)*1e-9))
fd = rep200(desc_body)
print("descend(empty tree) x200:", timeit(fd, tree)*1e3, "ms")

# fake deep-ish tree: expand a chain to force ~15 levels
import numpy as np
stats = np.zeros((B, S+1, 3), np.float32)
childr = np.full((B, S+1, 7), -1.0, np.float32)
prior = np.full((B, S+1, 7), -1e30, np.float32)
for lvl in range(15):
    stats[:, lvl] = [200-lvl, 0.0, 1.0]
    prior[:, lvl, :] = 1.0/7
    childr[:, lvl, 3] = lvl+1   # chain down action 3
stats[:, 15] = [1, 0, 0]
deep = tree.replace(stats=jnp.asarray(stats),
                    children=jnp.asarray(childr, tree.children.dtype),
                    prior=jnp.asarray(prior, tree.prior.dtype))
print("descend(depth15) x200:", timeit(fd, deep)*1e3, "ms")

# 2. apply_path x200
apath = jnp.zeros((B, dcap), jnp.int32)
mask = jnp.arange(dcap)[None,:] < 15
mask = jnp.broadcast_to(mask, (B, dcap))
def ap_body(i, acc):
    b = env.apply_path(boards, players, apath, mask)
    return acc + b.astype(jnp.float32).sum()*1e-9
fap = rep200(ap_body)
print("apply_path x200:", timeit(fap, jnp.float32(0))*1e3, "ms")

# 3. backup einsum x200
pathz = jnp.zeros((B, dcap), jnp.int32)
vals = jnp.ones((B, dcap, 3), jnp.float32)
def bk_body(i, t):
    return t.replace(stats=rows_scatter_add(t.stats, pathz, vals*1e-9))
fbk = rep200(bk_body)
print("backup x200:", timeit(fbk, tree)*1e3, "ms")

# 4. expansion writes x200
def ex_body(i, t):
    ps = jnp.zeros((B, 7), t.prior.dtype)
    pr = jax.lax.dynamic_update_index_in_dim(t.prior, ps, i % S, axis=1)
    em = (jax.nn.one_hot(jnp.zeros((B,),jnp.int32), S+1, dtype=t.children.dtype)[:, :, None]
          * jax.nn.one_hot(jnp.zeros((B,),jnp.int32), 7, dtype=t.children.dtype)[:, None, :])
    ch = jnp.where(em > 0, jnp.asarray(i % S).astype(t.children.dtype), t.children)
    return t.replace(prior=pr, children=ch)
fex = rep200(ex_body)
print("expansion x200:", timeit(fex, tree)*1e3, "ms")

# 5. eval x200 (inside one jit)
model = build_model(cfg.model, env)
params = init_params(model, env, jax.random.PRNGKey(0))
obs = jnp.zeros((B, env.feature_dim, 6, 7))
ev = make_eval_fn(model, params)
def ev_body(i, acc):
    p, v = ev(obs + acc*1e-12)
    return acc + v.sum()*1e-9
fev = rep200(ev_body)
print("eval x200:", timeit(fev, jnp.float32(0))*1e3, "ms")

# 6. won_batch + valid + obs build x200
def misc_body(i, acc):
    won = env.won_batch(boards[:, 0] + (acc*0).astype(jnp.int8))
    vm = jax.vmap(env.valid_mask_board)(boards, mc)
    ob = jax.vmap(env.observation_from_board)(boards, players)
    return acc + won.sum() + vm.sum() + ob.sum()*1e-9
fm = rep200(misc_body)
print("won+valid+obs x200:", timeit(fm, jnp.float32(0))*1e3, "ms")

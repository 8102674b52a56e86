"""Per-simulation budget on the real chip: Pallas sim kernel vs network
forward, and forward cost across net shapes/batches (to pick an
MXU-efficient flagship shape)."""
import time
import jax, jax.numpy as jnp

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import preset, ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search import pallas_mcts as P


def timeit(f, *a, n=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


cfg = preset("connect4")
env = make_env(cfg.env)
B, S = 512, 200
A, RC, F = env.action_dim, env.rows * env.cols, env.feature_dim
N = S + 1
dcap = 43

sim_fn, flush_fn = P.make_sim_step(env, cfg.mcts, B, dcap)

stats = jnp.zeros((3, N, B), jnp.float32).at[0, 0].set(1.0).at[2, 0].set(1.0)
prior = jnp.full((A, N, B), P.NEG, jnp.float32).at[:, 0, :].set(1.0 / A)
children = jnp.full((A, N, B), -1.0, jnp.float32)
board_t = jnp.zeros((2, RC, B), jnp.float32)
player_t = jnp.zeros((1, B), jnp.int32)
mc_t = jnp.zeros((1, B), jnp.int32)
path0 = jnp.full((dcap, B), N, jnp.int32)
meta0 = jnp.zeros((8, B), jnp.float32)
valid0 = jnp.zeros((A, B), jnp.float32)
probsT0 = jnp.zeros((A, B), jnp.float32)
pval0 = jnp.zeros((1, B), jnp.float32)


@jax.jit
def sim200(stats, prior, children, path):
    def body(i, c):
        stats, prior, children, path = c
        stats, prior, children, path, apath, meta, obs, valid = sim_fn(
            stats, prior, children, board_t, player_t, mc_t, path,
            meta0, valid0, probsT0, pval0, i - 1)
        return (stats, prior, children, path)
    return jax.lax.fori_loop(1, S, body, (stats, prior, children, path))


t = timeit(sim200, stats, prior, children, path0, n=5)
print(f"sim kernel x{S-1}: {t*1e3:.2f} ms  -> {t/(S-1)*1e6:.1f} us/sim")

# network forwards: per-shape per-batch
for fam, kw in [
    ("resnet", dict(channels=64, blocks=4)),
    ("resnet", dict(channels=128, blocks=2)),
    ("resnet", dict(channels=128, blocks=4)),
    ("resnet", dict(channels=32, blocks=4)),
]:
    mcfg = ModelConfig(family=fam, **kw)
    model = build_model(mcfg, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    ev = make_eval_fn(model, params)
    for b in (512, 2048, 4096):
        obs = jnp.zeros((b, F, env.rows, env.cols))

        @jax.jit
        def fwd200(acc, obs=obs, ev=ev):
            def body(i, acc):
                p, v = ev(obs + acc * 1e-12)
                return acc + v.sum() * 1e-9
            return jax.lax.fori_loop(0, 50, body, acc)

        t = timeit(fwd200, jnp.float32(0), n=3) / 50
        print(f"{fam} {kw} B={b}: {t*1e6:.1f} us/fwd "
              f"({t/b*1e9:.1f} ns/img)")

"""Decompose self-play step cost on the current device: NN eval vs search
machinery vs sims scaling.  Dev tool, not part of the library."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from alphazero_tpu.config import preset
from alphazero_tpu.data import create
from alphazero_tpu.envs import make_env
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.search.mcts import run_mcts
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = preset("connect4")
    env = make_env(cfg.env)
    model = build_model(cfg.model, env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    B = cfg.train.selfplay_batch
    obs = jnp.zeros((B, env.feature_dim, env.rows, env.cols))

    # 1. one NN eval
    eval_fn = make_eval_fn(model, params)
    f1 = jax.jit(lambda o: eval_fn(o))
    t = timeit(f1, obs)
    print(f"single eval (B={B}): {t*1e3:.2f} ms -> x200 = {t*200*1e3:.1f} ms")

    # 2. full MCTS, NN eval
    sp = init_selfplay(env, B, jax.random.PRNGKey(1))
    s = sp.env_state

    def mcts_full(board, player, mc, done, rng):
        return run_mcts(env, eval_fn, board, player, mc, done, rng,
                        cfg.mcts).visit_counts

    f2 = jax.jit(mcts_full)
    t2 = timeit(f2, s.board, s.current_player, s.move_count, s.done,
                jax.random.PRNGKey(2))
    print(f"mcts 200 sims w/ NN: {t2*1e3:.1f} ms")

    # 3. MCTS with constant evaluator (no NN cost)
    def const_eval(o):
        return jnp.full((o.shape[0], env.action_dim), 1.0 / env.action_dim), \
               jnp.zeros(o.shape[0])

    def mcts_const(board, player, mc, done, rng):
        return run_mcts(env, const_eval, board, player, mc, done, rng,
                        cfg.mcts).visit_counts

    f3 = jax.jit(mcts_const)
    t3 = timeit(f3, s.board, s.current_player, s.move_count, s.done,
                jax.random.PRNGKey(2))
    print(f"mcts 200 sims const-eval: {t3*1e3:.1f} ms")

    # 4. sims scaling
    for sims in (50, 100):
        c = dataclasses.replace(cfg.mcts, num_simulations=sims)

        def mcts_s(board, player, mc, done, rng, c=c):
            return run_mcts(env, const_eval, board, player, mc, done, rng,
                            c).visit_counts
        fs = jax.jit(mcts_s)
        ts = timeit(fs, s.board, s.current_player, s.move_count, s.done,
                    jax.random.PRNGKey(2))
        print(f"mcts {sims} sims const-eval: {ts*1e3:.1f} ms")

    # 5. full selfplay step (incl flush/reset)
    runner = make_selfplay_runner(env, model, cfg.mcts, cfg.replay,
                                  num_steps=1, donate=False)
    buffer = create(env, cfg.replay.capacity)
    t5 = timeit(lambda: runner(params, sp, buffer))
    print(f"selfplay_step total: {t5*1e3:.1f} ms "
          f"({B/t5:.0f} env-steps/s)")


if __name__ == "__main__":
    main()

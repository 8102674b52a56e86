"""On-chip compiled-Mosaic exactness check (VERDICT r1 #4/#5).

Interpret-mode tests pin the kernels' semantics on CPU; this script pins
the COMPILED kernels on the real TPU: with the exact stub evaluator
(integer-sum priors — bitwise identical across engines), the multi-move
chunk kernel's trajectory must equal the XLA engine's move-by-move
trajectory bitwise, and the single-move fused kernel's visit counts must
equal the XLA engine's bitwise.

Run from the repo root: ``timeout 900 python -m scripts.verify_fused_exact``
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from alphazero_tpu.config import MCTSConfig, ModelConfig
from alphazero_tpu.envs import make_env
from alphazero_tpu.envs.core import EnvState
from alphazero_tpu.models import build_model, init_params
from alphazero_tpu.search.mcts import run_mcts
import alphazero_tpu.search.pallas_fused as F

sys.path.insert(0, ".")
from tests.test_pallas_fused import _exact_stub_forwards  # noqa: E402


def main():
    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=64, blocks=1), env)
    params = init_params(model, env, jax.random.PRNGKey(0))
    kernel_stub, xla_eval = _exact_stub_forwards(env)
    orig = F._leaf_eval
    F._leaf_eval = kernel_stub
    try:
        cfg = MCTSConfig(num_simulations=24, temperature_moves=0,
                         use_dirichlet=False)
        B, M = 128, 6   # lane-aligned: the real supports_fused() regime
        boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
        players = jnp.zeros((B,), jnp.int32)
        mcs = jnp.zeros((B,), jnp.int32)

        rec = jax.jit(lambda r: F.run_selfplay_chunk_fused(
            env, model, params, boards, players, mcs, r, cfg, M))(
            jax.random.PRNGKey(7))
        rec = jax.tree.map(np.asarray, rec)

        cur_b, cur_p, cur_mc = boards, players, mcs
        for m in range(M):
            res = run_mcts(env, xla_eval, cur_b, cur_p, cur_mc,
                           jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg,
                           backend="xla")
            counts = np.asarray(res.visit_counts)
            total = np.maximum(counts.sum(-1, keepdims=True), 1)
            # visit COUNTS must match bitwise; the kernel's policy division
            # is Mosaic reciprocal+Newton (1 ulp off XLA's exactly-rounded
            # f32 divide), so reconstruct integers from the recorded policy
            got_counts = np.rint(rec["policy"][m] * total).astype(np.int64)
            np.testing.assert_array_equal(got_counts, counts,
                                          err_msg=f"move {m}")
            np.testing.assert_allclose(rec["policy"][m], counts / total,
                                       rtol=3e-7, atol=3e-8)
            action = counts.argmax(-1).astype(np.int32)
            np.testing.assert_array_equal(action, rec["action"][m])
            states = EnvState(board=cur_b, current_player=cur_p,
                              move_count=cur_mc,
                              winner=jnp.full((B,), -1, jnp.int32),
                              done=jnp.zeros((B,), bool))
            new = jax.vmap(env.step)(states, jnp.asarray(action))
            done = np.asarray(new.done)
            cur_b = jnp.asarray(np.where(done[:, None, None, None], 0,
                                         np.asarray(new.board))
                                .astype(np.int8))
            cur_p = jnp.asarray(np.where(done, 0,
                                         np.asarray(new.current_player))
                                .astype(np.int32))
            cur_mc = jnp.asarray(np.where(done, 0,
                                          np.asarray(new.move_count))
                                 .astype(np.int32))
        np.testing.assert_array_equal(np.asarray(cur_b), rec["board"])
        print(f"chunk kernel: {M} moves x {B} games bitwise-equal to the "
              "XLA engine on compiled Mosaic OK")
    finally:
        F._leaf_eval = orig


def real_forward_bitwise():
    """REAL WEIGHTS: the in-kernel dense forward vs the SAME jnp code
    compiled by XLA, bitwise, on the flagship config (VERDICT r2 #6).

    ``_dense_forward``/``_dense_forward_2x`` are pure jnp; compiled through
    Mosaic (inside pallas_call) and through XLA they must produce identical
    bits if both lower matmuls to the same MXU contraction order and the
    elementwise ops to the same VPU instructions.  This is the linchpin of
    the real-weights trajectory check below."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=512, blocks=3),
                        env)
    params = init_params(model, env, jax.random.PRNGKey(1))
    ws = F._pack_dense_params(model, params)
    W = jnp.asarray(F._game_tables(env)["W"])
    FD, RC = env.feature_dim, env.rows * env.cols

    results = {}
    # 512/256 route _dense_forward_2x (production self-play batches);
    # 128 the plain forward (arena half-batch).  Measured: the 2x path is
    # bitwise; the plain path at non-multiple-of-256 lanes diverges ~2e-4
    # (different lane tiling between the compilers) and stays under the
    # tolerance tests.
    for B in (512, 256, 128):
        rng = jax.random.PRNGKey(B)
        boards = (jax.random.uniform(rng, (B, 2, env.rows, env.cols))
                  < 0.2).astype(jnp.int8)
        boards = boards.at[:, 1].set(boards[:, 1] * (1 - boards[:, 0]))
        obs = jax.vmap(env.observation_from_board)(
            boards, jnp.zeros((B,), jnp.int32)).astype(jnp.float32)
        obs_t = obs.reshape(B, FD * RC).T

        def kernel(obs_ref, W_ref, *rest):
            wrefs = rest[:len(ws)]
            probs_ref, value_ref = rest[len(ws):]
            probs, value = F._leaf_eval(env, model, wrefs, obs_ref[:],
                                        W_ref[:])
            probs_ref[:] = probs
            value_ref[:] = value

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        got_p, got_v = jax.jit(pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((env.action_dim, B),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((1, B), jnp.float32)),
            in_specs=[vspec] * (2 + len(ws)),
            out_specs=(vspec, vspec),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        ))(obs_t, W, *ws)

        want_p, want_v = jax.jit(functools.partial(
            F._leaf_eval, env, model, ws))(obs_t, W)
        p_eq = np.array_equal(np.asarray(got_p), np.asarray(want_p))
        v_eq = np.array_equal(np.asarray(got_v), np.asarray(want_v))
        print(f"real-weights forward B={B}: probs bitwise={p_eq} "
              f"value bitwise={v_eq}")
        if not (p_eq and v_eq):
            dp = np.abs(np.asarray(got_p) - np.asarray(want_p)).max()
            dv = np.abs(np.asarray(got_v) - np.asarray(want_v)).max()
            print(f"  max |dprobs|={dp:.3e} |dvalue|={dv:.3e}")
        results[B] = p_eq and v_eq
    return results[512]


def real_weights_trajectory():
    """REAL WEIGHTS: chunk-kernel trajectory vs the XLA engine driven by a
    games-in-lanes twin eval that applies the kernel's 2^-14 prior
    quantization (pallas_fused._qfrac).  Given forward bitwise-ness
    (real_forward_bitwise), every quantity both engines compare is
    identical, so the trajectories must match bitwise."""
    env = make_env("connect4")
    model = build_model(ModelConfig(family="dense", width=512, blocks=3),
                        env)
    params = init_params(model, env, jax.random.PRNGKey(1))
    ws = F._pack_dense_params(model, params)
    W = jnp.asarray(F._game_tables(env)["W"])
    FD, RC = env.feature_dim, env.rows * env.cols

    @jax.jit
    def twin_eval(obs):                                   # (B, F, R, C)
        obs_t = obs.astype(jnp.float32).reshape(obs.shape[0], -1).T
        probs, value = F._leaf_eval(env, model, ws, obs_t, W)
        # the kernel stores priors as round(p·2^14)·2^-15 and decodes ·2
        probs_q = jnp.floor(probs * 16384.0 + 0.5) * (1.0 / 16384.0)
        return probs_q.T, value[0]

    cfg = MCTSConfig(num_simulations=48, temperature_moves=0,
                     use_dirichlet=False)
    B, M = 512, 4
    boards = jnp.zeros((B, 2, 6, 7), jnp.int8)
    players = jnp.zeros((B,), jnp.int32)
    mcs = jnp.zeros((B,), jnp.int32)

    rec = jax.jit(lambda r: F.run_selfplay_chunk_fused(
        env, model, params, boards, players, mcs, r, cfg, M))(
        jax.random.PRNGKey(7))
    rec = jax.tree.map(np.asarray, rec)

    cur_b, cur_p, cur_mc = boards, players, mcs
    for m in range(M):
        res = run_mcts(env, twin_eval, cur_b, cur_p, cur_mc,
                       jnp.zeros(B, bool), jax.random.PRNGKey(0), cfg,
                       backend="xla")
        counts = np.asarray(res.visit_counts)
        total = np.maximum(counts.sum(-1, keepdims=True), 1)
        got_counts = np.rint(rec["policy"][m] * total).astype(np.int64)
        np.testing.assert_array_equal(got_counts, counts,
                                      err_msg=f"move {m}")
        action = counts.argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(action, rec["action"][m])
        states = EnvState(board=cur_b, current_player=cur_p,
                          move_count=cur_mc,
                          winner=jnp.full((B,), -1, jnp.int32),
                          done=jnp.zeros((B,), bool))
        new = jax.vmap(env.step)(states, jnp.asarray(action))
        done = np.asarray(new.done)
        cur_b = jnp.asarray(np.where(done[:, None, None, None], 0,
                                     np.asarray(new.board)).astype(np.int8))
        cur_p = jnp.asarray(np.where(done, 0,
                                     np.asarray(new.current_player))
                            .astype(np.int32))
        cur_mc = jnp.asarray(np.where(done, 0, np.asarray(new.move_count))
                             .astype(np.int32))
    print(f"REAL-WEIGHTS chunk kernel: {M} moves x {B} games "
          "bitwise-equal to the XLA engine (twin eval) OK")


if __name__ == "__main__":
    main()
    if real_forward_bitwise():
        real_weights_trajectory()
    else:
        print("real-weights trajectory skipped: forward not bitwise "
              "(tolerance tests in tests/test_pallas_fused.py still pin it)")

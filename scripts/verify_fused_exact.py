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


if __name__ == "__main__":
    main()

"""Multi-chip trainer: the outer loop of training/loop.py driven through
the SPMD programs of parallel/spmd.py.

This is the production entry point for pod-slice training (SURVEY.md §2.3
actor/learner row, §7 build-order step 8): ``python -m alphazero_tpu train
--mesh data=N[,model=M]``.  Same collect → train → gate → promote semantics
as the single-host ``Trainer`` (reference start_train_loop, main.py:16-83),
with

  * the self-play game batch, replay buffer ring, and learner batch sharded
    over the 'data' mesh axis (gradient all-reduce inserted by XLA, riding
    ICI on a pod slice);
  * the ViT optionally tensor-parallel over 'model'
    (parallel/mesh.py:vit_param_sharding);
  * the dense flagship's whole-chunk Pallas kernel shard_map'd over 'data'
    (parallel/spmd.py:make_sharded_selfplay) when it applies;
  * a warm-up gate that skips learner chunks until every buffer shard holds
    at least one finished game (parallel/spmd.py:buffer_ready);
  * checkpoints saved/restored with their shardings intact (Orbax handles
    sharded arrays natively, tests/test_parallel.py roundtrip test).

On a multi-host pod slice each host runs this same program after
``parallel/distributed.initialize`` wires the JAX runtime; the mesh spans
the global device set and every host computes its shard of the same SPMD
program.  Host-side phases that are not sharded (gating arena, vanilla
sanity matches) compute identical replicated results on every host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.data.replay import to_sharded
from alphazero_tpu.parallel.mesh import make_mesh
from alphazero_tpu.parallel.spmd import (make_collect_chunk, make_train_chunk,
                                         shardings_for)
from alphazero_tpu.training.learner import make_optimizer
from alphazero_tpu.training.loop import TRAIN_CHUNK_STEPS, Trainer
from alphazero_tpu.utils.metrics import MetricsLogger


class SpmdTrainer(Trainer):
    """``Trainer`` with the collect and train phases jitted over a device
    mesh.  ``interpret=True`` runs the fused self-play kernel in interpret
    mode (CPU-mesh tests / dryruns); on TPU leave it False."""

    def __init__(self, cfg: Config, mesh=None, workdir: Optional[str] = None,
                 logger: Optional[MetricsLogger] = None,
                 display: bool = False, interpret: bool = False,
                 fused_selfplay: Optional[bool] = None):
        super().__init__(cfg, workdir=workdir, logger=logger, display=display)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_model=cfg.mesh.model_parallel)
        n_data = self.mesh.shape["data"]
        B = cfg.train.selfplay_batch
        if B % n_data != 0:
            raise ValueError(f"selfplay_batch {B} must divide over "
                             f"data={n_data} shards")
        if cfg.train.batch_size % n_data != 0:
            raise ValueError(f"batch_size {cfg.train.batch_size} must divide "
                             f"over data={n_data} shards")

        tp = (cfg.model.family == "vit" and self.mesh.shape["model"] > 1)
        # one buffer ring per 'data' shard (data/replay.py:create_sharded)
        self.buffer = to_sharded(self.buffer, n_data)
        p_sh, sp_sh, buf_sh, r_sh = shardings_for(
            self.env, self.model, cfg, self.mesh, self.params_best,
            self.sp, self.buffer, tensor_parallel=tp)
        self._p_sh = p_sh

        collect = make_collect_chunk(
            self.env, self.model, cfg, self.mesh,
            num_steps=self._chunk_steps, tensor_parallel=tp,
            fused_selfplay=fused_selfplay, interpret=interpret)
        # same signature as the single-host runner → Trainer.collect's
        # pipelined fetch loop drives this program unchanged
        self._runner = jax.jit(collect, in_shardings=(p_sh, sp_sh, buf_sh),
                               out_shardings=(sp_sh, buf_sh))
        train = make_train_chunk(self.env, self.model, cfg, self.mesh,
                                 num_steps=TRAIN_CHUNK_STEPS)
        self._train_chunk = jax.jit(
            train, in_shardings=(p_sh, None, buf_sh, r_sh, None),
            out_shardings=(p_sh, None, r_sh, None, None))

        # place the live state
        self.params_best = jax.device_put(self.params_best, p_sh)
        self.params_new = jax.device_put(self.params_new, p_sh)
        self.sp = jax.tree.map(jax.device_put, self.sp, sp_sh)
        self.buffer = jax.tree.map(jax.device_put, self.buffer, buf_sh)
        self.rng = jax.device_put(self.rng, r_sh)

    # ------------------------------------------------------------- phases
    # collect() is inherited: Trainer.collect drives self._runner, which is
    # now the sharded program.

    def train_epoch(self) -> dict:
        """SGD on the contender over the mesh: buffer//batch steps, fresh
        Adam per epoch, warm-up-gated on every shard having data."""
        import time

        steps = max(self._buffer_rows() // self.cfg.train.batch_size, 1)
        if self.cfg.train.train_steps_per_iter is not None:
            steps = self.cfg.train.train_steps_per_iter
        opt_state = make_optimizer(self.cfg.train).init(self.params_new)
        t0 = time.time()
        done, metrics, trained = 0, None, False
        while done < steps:
            active = min(TRAIN_CHUNK_STEPS, steps - done)
            self.params_new, opt_state, self.rng, metrics, ready = \
                self._train_chunk(self.params_new, opt_state, self.buffer,
                                  self.rng, jnp.int32(active))
            trained = trained or bool(ready)
            done += active
        m = {
            "steps": done if trained else 0,
            "trained": trained,       # False ⇔ warm-up gate held (a shard
                                      # ring was still empty)
            "loss": float(metrics.loss),
            "policy_loss": float(metrics.policy_loss),
            "value_loss": float(metrics.value_loss),
            "l2": float(metrics.l2),
            "seconds": time.time() - t0,
        }
        self.log.log("train", **m)
        return m

    def gate(self) -> float:
        """Contender-vs-best arena on replicated params.  A contender that
        never trained (warm-up) auto-fails so promotion waits for data.

        The readiness check is a device-side reduction fetched as a scalar:
        on a multi-host pod slice the sharded ``buffer.size`` is not fully
        addressable, so ``np.asarray`` on it would raise — ``jnp.min``
        produces a replicated scalar every host can read."""
        if not bool(jax.device_get(jnp.min(self.buffer.size) > 0)):
            return 0.0 if self.cfg.train.gate_enabled else 1.0
        return super().gate()

    def expand_depth(self, new_depth: int):
        raise NotImplementedError(
            "--expand-depth under --mesh is not supported; expand on a "
            "single host, checkpoint, then resume with --mesh")

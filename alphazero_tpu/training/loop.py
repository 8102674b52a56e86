"""Outer training loop: collect → train → gate → promote.

The reference's ``start_train_loop`` (main.py:16-83) re-built TPU-first:
self-play collection and SGD both run as jitted device programs; the gating
arena is REAL (the reference hardcodes acceptance, main.py:49) with a flag
to disable for parity runs; rejection doubles data collection after
``reject_double_after`` consecutive rejections (main.py:25-28); every
``vanilla_eval_every`` promotions the model plays sanity games against
vanilla MCTS (main.py:74-76)."""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config, MCTSConfig
from alphazero_tpu.data import create as create_buffer
from alphazero_tpu.data import num_rows_augmented
from alphazero_tpu.data.augment import Symmetries
from alphazero_tpu.envs import make_env
from alphazero_tpu.eval.arena import Agent, compare
from alphazero_tpu.models import build_model, init_params, make_eval_fn
from alphazero_tpu.training.learner import make_optimizer, make_train_epoch
from alphazero_tpu.training.selfplay import init_selfplay, make_selfplay_runner
from alphazero_tpu.utils.checkpoint import CheckpointManager
from alphazero_tpu.utils.metrics import MetricsLogger

# Static scan lengths so each jit compiles once.  32 self-play moves per
# dispatch amortizes per-chunk costs (Dirichlet noise generation is
# call-overhead-bound: 0.59 ms/move at 8-move chunks, 0.05 at 32+).
# AZ_CHUNK_STEPS overrides for profiling and interpret-mode dryruns.
import os as _os
SELFPLAY_CHUNK_STEPS = int(_os.environ.get("AZ_CHUNK_STEPS", "32"))
TRAIN_CHUNK_STEPS = 32


class Trainer:
    """Single-host trainer (multi-host sharding lives in parallel/)."""

    def __init__(self, cfg: Config, workdir: Optional[str] = None,
                 logger: Optional[MetricsLogger] = None,
                 display: bool = False, persist_config: bool = True):
        # display: render game 0's board after every self-play chunk —
        # the reference's self_play(display=True) (connect4.py:117,141-148)
        self.display = display
        self.cfg = cfg
        self.env = make_env(cfg.env)
        self.model = build_model(cfg.model, self.env)
        self.log = logger or MetricsLogger()

        rng = jax.random.PRNGKey(cfg.train.seed)
        rng, pk, sk = jax.random.split(rng, 3)
        self.rng = rng
        # best ("older") generates data; contender ("newer") trains
        # (main.py:134-145).
        self.params_best = init_params(self.model, self.env, pk)
        self.params_new = self.params_best
        self.buffer = create_buffer(self.env, cfg.replay.capacity)
        self.sp = init_selfplay(self.env, cfg.train.selfplay_batch, sk)
        self.version = 0
        self.outer_iter = 0
        self.reject_count = 0

        self._syms = Symmetries(self.env)
        # chunk length: AZ_CHUNK_STEPS env (folded into the module default,
        # which tests also monkeypatch) > config field > 32
        self._chunk_steps = (SELFPLAY_CHUNK_STEPS
                             if _os.environ.get("AZ_CHUNK_STEPS")
                             or cfg.train.selfplay_chunk_steps is None
                             else cfg.train.selfplay_chunk_steps)
        self._runner = make_selfplay_runner(
            self.env, self.model, cfg.mcts, cfg.replay,
            num_steps=self._chunk_steps, donate=False,
        )
        self._epoch = make_train_epoch(
            self.model, cfg.train, num_steps=TRAIN_CHUNK_STEPS, donate=False,
            syms=self._syms if cfg.replay.augment else None,
            augment_skip=cfg.replay.augment_skip_moves,
        )
        self._ckpt = CheckpointManager(f"{workdir}/checkpoints") if workdir else None
        if workdir and persist_config:
            # persist the run's config beside its checkpoints so eval /
            # cross-run tools can rebuild the exact model (the reference
            # makes the operator re-type Net hyperparameters, main.py:187).
            # TRAIN runs own their workdir and write unconditionally (a
            # re-train with new settings must refresh config.json or later
            # restores rebuild the wrong geometry); read-only commands
            # (eval/play) pass persist_config=False so they neither
            # clobber an existing run's config nor fabricate one for
            # legacy workdirs (ADVICE r4).
            from alphazero_tpu.config import save_config
            save_config(cfg, workdir)

    # ------------------------------------------------------------- phases
    def collect(self, games_target: int) -> dict:
        """Self-play with the best params until ``games_target`` new games
        finish (reference collect_data, train.py:54-83).

        One chunk is always kept in flight: the host checks chunk k's game
        counter while chunk k+1 already runs on device, so the per-chunk
        host fetch (the only sync point) never stalls the chip.  Costs at
        most one chunk of overshoot — the extra games land in the buffer
        and in the counters like any others."""
        start_games = int(self.sp.games_done)
        start_steps = int(self.sp.env_steps)
        t0 = time.time()
        if self.display:
            # rendering fetches state per chunk anyway — no pipelining
            while int(self.sp.games_done) - start_games < games_target:
                self.sp, self.buffer = self._runner(
                    self.params_best, self.sp, self.buffer
                )
                s0 = jax.tree.map(lambda x: x[0], self.sp.env_state)
                print(f"[game 0, move {int(s0.move_count)}]\n"
                      f"{self.env.render(s0)}", flush=True)
        else:
            while True:
                done_prev = self.sp.games_done     # device scalar, no fetch
                self.sp, self.buffer = self._runner(
                    self.params_best, self.sp, self.buffer
                )
                if int(done_prev) - start_games >= games_target:
                    break
        dt = time.time() - t0
        steps = int(self.sp.env_steps) - start_steps
        m = {
            "games": int(self.sp.games_done) - start_games,
            "env_steps": steps,
            "env_steps_per_s": steps / max(dt, 1e-9),
            "sims_per_s": steps * self.cfg.mcts.num_simulations / max(dt, 1e-9),
            "buffer_size": self._buffer_rows(),
            "results": np.asarray(self.sp.results).tolist(),
            "seconds": dt,
        }
        self.log.log("collect", **m)
        return m

    def _buffer_rows(self) -> int:
        """Buffer occupancy in the reference's units: augmented rows
        (symmetry orbits counted, data/replay.py:num_rows_augmented)."""
        n_syms = self._syms.num if self.cfg.replay.augment else 1
        return int(num_rows_augmented(self.buffer, n_syms,
                                      self.cfg.replay.augment_skip_moves))

    def train_epoch(self) -> dict:
        """SGD on the contender: buffer//batch steps, fresh Adam state
        (train.py:85-123, main.py:35)."""
        steps = max(self._buffer_rows() // self.cfg.train.batch_size, 1)
        if self.cfg.train.train_steps_per_iter is not None:
            steps = self.cfg.train.train_steps_per_iter
        opt_state = make_optimizer(self.cfg.train).init(self.params_new)
        t0 = time.time()
        done, metrics = 0, None
        while done < steps:
            self.rng, k = jax.random.split(self.rng)
            active = min(TRAIN_CHUNK_STEPS, steps - done)
            self.params_new, opt_state, metrics = self._epoch(
                self.params_new, opt_state, self.buffer, k,
                jnp.int32(active)
            )
            done += active
        m = {
            "steps": done,
            "loss": float(metrics.loss),
            "policy_loss": float(metrics.policy_loss),
            "value_loss": float(metrics.value_loss),
            "l2": float(metrics.l2),
            "seconds": time.time() - t0,
        }
        self.log.log("train", **m)
        return m

    def gate(self) -> float:
        """Contender-vs-best arena → win rate.  Disabled gate auto-accepts
        like the reference stub (main.py:48-50)."""
        if not self.cfg.train.gate_enabled:
            return 1.0
        self.rng, k = jax.random.split(self.rng)
        best = Agent(make_eval_fn(self.model, self.params_best), self.cfg.mcts)
        cont = Agent(make_eval_fn(self.model, self.params_new), self.cfg.mcts)
        rate, score = compare(self.env, best, cont,
                              self.cfg.train.gate_games, k, sampling=True)
        self.log.log("gate", win_rate=rate, score=score.tolist())
        return rate

    def vanilla_sanity_match(self, games: int = 2) -> float:
        """Strength floor vs pure-rollout MCTS (main.py:74-76)."""
        self.rng, k = jax.random.split(self.rng)
        sims = min(self.cfg.mcts.num_simulations * max(self.version, 1), 400)
        vanilla = Agent(None, dataclasses.replace(self.cfg.mcts,
                                                  num_simulations=sims))
        model_agent = Agent(make_eval_fn(self.model, self.params_best),
                            self.cfg.mcts)
        rate, score = compare(self.env, vanilla, model_agent, games, k)
        self.log.log("vanilla_eval", model_win_rate=rate,
                     vanilla_sims=sims, score=score.tolist())
        return rate

    # ------------------------------------------------------------ iteration
    def iterate(self, vanilla_eval: bool = True) -> dict:
        """One outer iteration of main.py:23-81."""
        self.outer_iter += 1
        games = self.cfg.train.games_per_iter
        if self.reject_count >= self.cfg.train.reject_double_after:
            games *= 2  # main.py:25-28
        cm = self.collect(games)
        tm = self.train_epoch()
        rate = self.gate()
        accepted = rate > self.cfg.train.gate_threshold  # main.py:50
        if accepted:
            self.params_best = self.params_new
            self.version += 1
            self.reject_count = 0
            if self._ckpt:
                self.save_checkpoint()
            if (vanilla_eval
                    and self.version % self.cfg.train.vanilla_eval_every == 0):
                self.vanilla_sanity_match()
        else:
            self.params_new = self.params_best  # revert (main.py:79-81)
            self.reject_count += 1
        m = {"iter": self.outer_iter, "version": self.version,
             "accepted": bool(accepted), "gate_rate": rate, **cm, **tm}
        self.log.log("iteration", **m)
        return m

    def run(self, iterations: Optional[int] = None):
        n = iterations or self.cfg.train.outer_iterations
        for _ in range(n):
            self.iterate()

    # ---------------------------------------------------------- checkpoint
    def _state(self):
        return {
            "params_best": self.params_best,
            "params_new": self.params_new,
            "buffer": self.buffer,
            "rng": self.rng,
            "version": jnp.int32(self.version),
            "outer_iter": jnp.int32(self.outer_iter),
        }

    def save_checkpoint(self):
        if self._ckpt:
            self._ckpt.save(self.version, self._state())

    def import_buffer(self, workdir: str, step: Optional[int] = None) -> int:
        """Seed this run's replay buffer from another run's checkpoint.

        The reference preloads a standalone buffer pickle into a fresh run
        (main.py:129, replay_buffer.py:57-65) — e.g. to train a different
        model family on the same collected data (mode 4, main.py:212-231).
        Copies the most recent ``min(src_size, capacity)`` rows; the source
        run's env geometry must match.  Returns rows imported.
        """
        from alphazero_tpu.utils.checkpoint import CheckpointManager
        src = CheckpointManager(f"{workdir}/checkpoints").restore_raw(step)
        if src is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        b = src["buffer"]
        obs = np.asarray(b["obs"])
        policy = np.asarray(b["policy"])
        length = np.asarray(b["length"])
        winner = np.asarray(b["winner"])
        if obs.shape[1:] != tuple(self.buffer.obs.shape[1:]):
            raise ValueError(
                f"buffer geometry mismatch: source blocks {obs.shape[1:]}, "
                f"this env needs {tuple(self.buffer.obs.shape[1:])}")
        size, cursor, cap_src = int(b["size"]), int(b["cursor"]), obs.shape[0]
        k = min(size, self.buffer.capacity)
        if size < cap_src:
            idx = np.arange(size)[-k:]
        else:  # ring full: oldest block is at the cursor
            idx = (cursor - k + np.arange(k)) % cap_src
        self.buffer = self.buffer.replace(
            obs=self.buffer.obs.at[:k].set(jnp.asarray(obs[idx], jnp.int8)),
            policy=self.buffer.policy.at[:k].set(
                jnp.asarray(policy[idx], jnp.float32)),
            length=self.buffer.length.at[:k].set(
                jnp.asarray(length[idx], jnp.int32)),
            winner=self.buffer.winner.at[:k].set(
                jnp.asarray(winner[idx], jnp.int32)),
            cursor=jnp.int32(k % self.buffer.capacity),
            size=jnp.int32(k),
        )
        return k

    def expand_depth(self, new_depth: int):
        """Grow the ViT to ``new_depth`` transformer blocks in place,
        transferring every matching parameter (reference
        expand_transformer_layers, main.py:99-120).  Both best and
        contender params are expanded; jitted programs are rebuilt."""
        from alphazero_tpu.models.surgery import expand_vit_depth
        if self.cfg.model.family != "vit":
            raise ValueError("depth expansion applies to the ViT family "
                             f"(this run: {self.cfg.model.family!r})")
        self.rng, k = jax.random.split(self.rng)
        mcfg, self.model, self.params_best = expand_vit_depth(
            self.cfg.model, self.env, self.params_best, new_depth, k)
        _, _, self.params_new = expand_vit_depth(
            self.cfg.model, self.env, self.params_new, new_depth, k)
        self.cfg = dataclasses.replace(self.cfg, model=mcfg)
        self._runner = make_selfplay_runner(
            self.env, self.model, self.cfg.mcts, self.cfg.replay,
            num_steps=self._chunk_steps, donate=False,
        )
        self._epoch = make_train_epoch(
            self.model, self.cfg.train, num_steps=TRAIN_CHUNK_STEPS,
            donate=False,
            syms=self._syms if self.cfg.replay.augment else None,
            augment_skip=self.cfg.replay.augment_skip_moves,
        )

    def restore_checkpoint(self, step: Optional[int] = None) -> bool:
        if not self._ckpt:
            return False
        restored = self._ckpt.restore(self._state(), step=step)
        if restored is None:
            return False
        self.params_best = restored["params_best"]
        self.params_new = restored["params_new"]
        self.buffer = restored["buffer"]
        self.rng = restored["rng"]
        self.version = int(restored["version"])
        self.outer_iter = int(restored["outer_iter"])
        return True

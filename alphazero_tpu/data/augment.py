"""Symmetry augmentation as pure permutation gathers.

The reference augments on the host with np.rot90/np.flip at buffer-write time
(train.py:8-49).  Here each env exposes its symmetry group as precomputed
cell/action index permutations (envs/core.py), so augmentation is a batched
gather that runs on device inside the jitted self-play step.

Per-game groups (dihedral-8 for tictactoe/gomoku, identity+LR for connect4)
replace the reference's unconditional dihedral-8, which crashes/corrupts for
connect4's column policy (SURVEY.md §2.4-2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Symmetries:
    """Device-resident permutation tables for one env."""

    def __init__(self, env):
        cell_perms, action_perms = env.symmetries()
        self.cell_perms = jnp.asarray(cell_perms)      # (S, R*C)
        self.action_perms = jnp.asarray(action_perms)  # (S, A)
        self.num = int(cell_perms.shape[0])
        self.rows, self.cols = env.rows, env.cols

    def apply(self, s: int, obs: jax.Array, policy: jax.Array):
        """Apply symmetry ``s`` to batched obs ``(..., F, R, C)`` and policy
        ``(..., A)``: ``new[i] = old[perm[i]]``."""
        cp = self.cell_perms[s]
        ap = self.action_perms[s]
        flat = obs.reshape(obs.shape[:-2] + (self.rows * self.cols,))
        obs2 = jnp.take(flat, cp, axis=-1).reshape(obs.shape)
        pol2 = jnp.take(policy, ap, axis=-1)
        return obs2, pol2

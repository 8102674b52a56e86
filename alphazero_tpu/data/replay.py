"""Device-resident replay ring buffer.

Replaces the reference's host-side ``deque`` + pickle persistence
(replay_buffer.py:7-65) with fixed-shape device arrays and a write cursor so
that self-play writes and learner sampling happen inside ``jit`` with no
host round-trips.

Deliberate deltas from the reference (SURVEY.md §7):
  * uniform sampling WITH replacement (the deque samples without,
    replay_buffer.py:16 — immaterial at 100k capacity);
  * persistence rides the Orbax checkpoint of the whole training state
    instead of standalone pickles (main.py:38-40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    """Ring buffer of (observation, policy target, value target) rows
    (the reference's (state, policy, reward) triple, replay_buffer.py:12)."""

    obs: jax.Array      # (cap, F, R, C) int8 — canonical observations
    policy: jax.Array   # (cap, A) float32
    value: jax.Array    # (cap,) float32
    cursor: jax.Array   # () int32 — next write slot
    size: jax.Array     # () int32 — valid rows (≤ cap)

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def create(env, capacity: int) -> ReplayBuffer:
    return ReplayBuffer(
        obs=jnp.zeros((capacity, env.feature_dim, env.rows, env.cols), jnp.int8),
        policy=jnp.zeros((capacity, env.action_dim), jnp.float32),
        value=jnp.zeros((capacity,), jnp.float32),
        cursor=jnp.int32(0),
        size=jnp.int32(0),
    )


def add_batch(buf: ReplayBuffer, obs, policy, value, mask) -> ReplayBuffer:
    """Masked ring write of up to n rows in one scatter.

    Rows with ``mask[i]`` land at consecutive ring slots starting at the
    cursor (in index order); others are dropped via out-of-bounds scatter.
    """
    mask = mask.astype(jnp.int32)
    ranks = jnp.cumsum(mask) - 1                       # rank among kept rows
    cap = buf.capacity
    idx = jnp.where(mask == 1, (buf.cursor + ranks) % cap, cap)
    n = mask.sum()
    return buf.replace(
        obs=buf.obs.at[idx].set(obs.astype(jnp.int8), mode="drop"),
        policy=buf.policy.at[idx].set(policy.astype(jnp.float32), mode="drop"),
        value=buf.value.at[idx].set(value.astype(jnp.float32), mode="drop"),
        cursor=(buf.cursor + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def sample(buf: ReplayBuffer, rng, batch_size: int):
    """Uniform sample of ``batch_size`` rows → (obs f32, policy, value)."""
    idx = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return (
        buf.obs[idx].astype(jnp.float32),
        buf.policy[idx],
        buf.value[idx],
    )

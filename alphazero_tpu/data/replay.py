"""Device-resident replay buffer of whole-game blocks.

Replaces the reference's host-side ``deque`` of augmented position rows +
pickle persistence (replay_buffer.py:7-65) with fixed-shape device arrays
so that self-play writes and learner sampling happen inside ``jit`` with no
host round-trips.

Layout: a ring of GAME BLOCKS, not position rows.  A finished game's
trajectory slab (obs/π for up to ``L = env.max_moves`` moves, plus its
length and winner) is written as one contiguous block — a scatter of B
block indices per flush instead of a masked scatter of B·L row indices.
Measured on v5e: the row-granular flush cost 5.2 ms/move of the self-play
budget (XLA lowers large dynamic row scatters serially) and 850 s of XLA
compile; the block flush is ~100x cheaper on both axes.

Sampling draws (game, move, symmetry) tuples:
  * game ∝ its recorded length (positions stay uniform, train.py:30-49's
    one-row-per-position semantics);
  * symmetry uniform over the env's group for rows ≥ ``augment_skip``,
    identity otherwise (train.py:39, SURVEY.md §2.4-9) — sampling the
    symmetry at read time is distributionally identical to the reference's
    materialized 8-fold orbit (uniform over stored (position, sym) rows ≡
    position then sym independently);
  * the value target is reconstructed from the game winner and move parity
    (train.py:33-36; self-play games always open with player 0, so the
    player to move at row r is ``r % 2``).

Deliberate deltas from the reference (SURVEY.md §7):
  * uniform sampling WITH replacement (the deque samples without,
    replay_buffer.py:16 — immaterial at these capacities);
  * capacity counts raw positions in full-length blocks (``capacity // L``
    games); the reference's 100k counts augmented rows;
  * persistence rides the Orbax checkpoint of the whole training state
    instead of standalone pickles (main.py:38-40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    """Ring of whole-game trajectory blocks (one per finished game)."""

    obs: jax.Array      # (G, L, F, R, C) int8 — canonical observations
    policy: jax.Array   # (G, L, A) float32 — root visit distributions
    length: jax.Array   # (G,) int32 — recorded moves (0 = empty block)
    winner: jax.Array   # (G,) int32 — 0/1 winner or -1 draw
    cursor: jax.Array   # () int32 — next block slot
    size: jax.Array     # () int32 — valid blocks (≤ G)

    @property
    def capacity(self) -> int:
        """Block capacity (games)."""
        return self.obs.shape[0]

    @property
    def max_len(self) -> int:
        return self.obs.shape[1]


def create(env, capacity: int) -> ReplayBuffer:
    """``capacity`` is in positions; block count is ``capacity // L``."""
    L = env.max_moves
    G = max(capacity // L, 1)
    return ReplayBuffer(
        obs=jnp.zeros((G, L, env.feature_dim, env.rows, env.cols), jnp.int8),
        policy=jnp.zeros((G, L, env.action_dim), jnp.float32),
        length=jnp.zeros((G,), jnp.int32),
        winner=jnp.full((G,), -1, jnp.int32),
        cursor=jnp.int32(0),
        size=jnp.int32(0),
    )


def create_sharded(env, capacity: int, num_shards: int) -> ReplayBuffer:
    """Buffer split into ``num_shards`` independent block rings (leading
    dim), one per 'data' mesh shard: arrays are ``(S, G//S, ...)`` and
    cursor/size are ``(S,)``.

    Sharding the leading dim over 'data' keeps every write/sample local to
    the shard that produced/consumes it — per-device memory and write
    bandwidth stay constant as the mesh grows (SURVEY.md §2.3
    "device-resident replay buffer per host").  ``add_games``/``sample``
    accept both layouts (dispatch on ``cursor.ndim``).
    """
    flat = create(env, capacity)
    G = flat.capacity
    assert G % num_shards == 0, (G, num_shards)

    def shard(x):
        return x.reshape((num_shards, G // num_shards) + x.shape[1:])

    return ReplayBuffer(
        obs=shard(flat.obs), policy=shard(flat.policy),
        length=shard(flat.length), winner=shard(flat.winner),
        cursor=jnp.zeros((num_shards,), jnp.int32),
        size=jnp.zeros((num_shards,), jnp.int32),
    )


def to_sharded(buf: ReplayBuffer, num_shards: int) -> ReplayBuffer:
    """Re-layout a flat buffer into ``num_shards`` rings (contiguous block
    split).  Block content is preserved exactly; ring age ordering within a
    wrapped buffer is not reconstructed per shard (uniform sampling does
    not observe it)."""
    if buf.cursor.ndim == 1:
        assert buf.cursor.shape[0] == num_shards, "already sharded"
        return buf
    S = num_shards
    G = buf.capacity
    Gs = G // S      # non-divisible capacities drop the last G % S blocks
    assert Gs > 0, (G, S)
    sizes = jnp.clip(jnp.minimum(buf.size, Gs * S) - jnp.arange(S) * Gs,
                     0, Gs)

    def shard(x):
        return x[: Gs * S].reshape((S, Gs) + x.shape[1:])

    return ReplayBuffer(
        obs=shard(buf.obs), policy=shard(buf.policy),
        length=shard(buf.length), winner=shard(buf.winner),
        cursor=(sizes % Gs).astype(jnp.int32),
        size=sizes.astype(jnp.int32),
    )


def add_games(buf: ReplayBuffer, obs_slab, policy_slab, length, winner,
              mask) -> ReplayBuffer:
    """Write finished games' trajectory slabs as ring blocks.

    Args: ``obs_slab (B, L, F, R, C)``, ``policy_slab (B, L, A)``,
    ``length (B,)`` moves recorded, ``winner (B,)``, ``mask (B,)`` — which
    games finished.  Games with ``mask`` land at consecutive ring blocks
    from the cursor; others drop via out-of-bounds scatter.

    With a sharded buffer, the game batch is split contiguously across
    shards (games shard the same way over 'data', so blocks stay on the
    device that played them).
    """
    if buf.cursor.ndim == 1:                      # sharded: vmap over shards
        S = buf.cursor.shape[0]

        def shard(x):
            return x.reshape((S, x.shape[0] // S) + x.shape[1:])

        return jax.vmap(add_games)(buf, shard(obs_slab), shard(policy_slab),
                                   shard(length), shard(winner), shard(mask))
    m = mask.astype(jnp.int32)
    ranks = jnp.cumsum(m) - 1
    G = buf.capacity
    idx = jnp.where(m == 1, (buf.cursor + ranks) % G, G)
    n = m.sum()
    return buf.replace(
        obs=buf.obs.at[idx].set(obs_slab.astype(jnp.int8), mode="drop"),
        policy=buf.policy.at[idx].set(policy_slab.astype(jnp.float32),
                                      mode="drop"),
        length=buf.length.at[idx].set(length.astype(jnp.int32), mode="drop"),
        winner=buf.winner.at[idx].set(winner.astype(jnp.int32), mode="drop"),
        cursor=(buf.cursor + n) % G,
        size=jnp.minimum(buf.size + n, G),
    )


def num_rows(buf: ReplayBuffer) -> jax.Array:
    """Total recorded positions (pre-augmentation) across valid blocks."""
    return jnp.sum(buf.length)


def num_rows_augmented(buf: ReplayBuffer, num_syms: int,
                       skip: int) -> jax.Array:
    """Position count in the reference's units — each row ≥ ``skip`` counts
    its full symmetry orbit (train.py:39-49) — so schedules derived from
    buffer occupancy (train steps = size // batch, main.py:35) match."""
    l = buf.length
    return jnp.sum(jnp.minimum(l, skip) + jnp.maximum(l - skip, 0) * num_syms)


def sample(buf: ReplayBuffer, rng, batch_size: int, syms=None,
           augment_skip: int = 0):
    """Uniform position sample → (obs f32 (bs,F,R,C), policy (bs,A),
    value (bs,)).

    ``syms`` (data/augment.py Symmetries) applies a uniformly random group
    element per draw; rows before ``augment_skip`` stay identity.
    """
    if buf.cursor.ndim == 1:
        # Each shard contributes batch_size/S rows unconditionally.  During
        # warm-up a still-empty shard contributes all-zero observations with
        # value 0 (the all-empty guard picks block 0), diluting early batches;
        # callers that care should delay training until every shard has data
        # (jnp.min(buf.size) > 0 — see parallel/spmd.py warmup note).
        # Per-shard resampling inside jit would need data-dependent shapes.
        S = buf.cursor.shape[0]
        assert batch_size % S == 0, (batch_size, S)
        out = jax.vmap(lambda b, k: sample(b, k, batch_size // S, syms,
                                           augment_skip))(
            buf, jax.random.split(rng, S))
        return tuple(x.reshape((batch_size,) + x.shape[2:]) for x in out)

    G = buf.capacity
    kg, kr, ks = jax.random.split(rng, 3)
    # game ∝ length (positions uniform); empty blocks get -inf
    logits = jnp.where(buf.length > 0,
                       jnp.log(jnp.maximum(buf.length, 1).astype(jnp.float32)),
                       -jnp.inf)
    g = jax.random.categorical(kg, logits, shape=(batch_size,))
    g = jnp.where(jnp.isfinite(logits).any(), g, 0)      # all-empty guard
    r = jax.random.randint(kr, (batch_size,), 0, 1 << 30) \
        % jnp.maximum(buf.length[g], 1)

    obs = buf.obs[g, r].astype(jnp.float32)              # (bs, F, R, C)
    pol = buf.policy[g, r]                               # (bs, A)
    # value target: game outcome from the row player's perspective
    # (train.py:33-36); self-play games open with player 0 → player = r % 2
    w = buf.winner[g]
    val = jnp.where(w < 0, 0.0,
                    jnp.where(r % 2 == w, 1.0, -1.0)).astype(jnp.float32)

    if syms is not None and syms.num > 1:
        s = jax.random.randint(ks, (batch_size,), 0, syms.num)
        s = jnp.where(r < augment_skip, 0, s)
        # O(1) in the group size: gather each row through ITS sampled
        # permutation (cell_perms[s] is a per-row permutation table) instead
        # of materializing all |G| variants and mask-selecting — 1x transform
        # bandwidth on the learner's critical path rather than |G|x.
        cp = syms.cell_perms[s]                       # (bs, RC)
        ap = syms.action_perms[s]                     # (bs, A)
        flat = obs.reshape(obs.shape[:-2] + (cp.shape[-1],))
        obs = jnp.take_along_axis(flat, cp[:, None, :],
                                  axis=-1).reshape(obs.shape)
        pol = jnp.take_along_axis(pol, ap, axis=-1)
    return obs, pol, val

"""MXU-friendly gathers: one-hot matmuls instead of irregular indexing.

XLA lowers per-game dynamic gathers/scatters (``arr[arange(B), idx]``) on TPU
to a serial loop over the batch — measured ~50-100µs per op for B=512.  A
one-hot contraction computes the same result as a dense matmul on the MXU in
microseconds, and is numerically EXACT: every output element receives exactly
one nonzero contribution (0/1 weights), so even float64 parity survives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_gather(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``arr (B, N, X), idx (B,) -> (B, X)`` — one row per game.

    Out-of-range indices (e.g. -1) yield zero rows (one_hot semantics).
    """
    B, N = arr.shape[:2]
    oh = jax.nn.one_hot(idx, N, dtype=arr.dtype)
    return jnp.einsum("bn,bnx->bx", oh, arr,
                      preferred_element_type=arr.dtype)


def rows_gather(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``arr (B, N, X), idx (B, K) -> (B, K, X)`` — K rows per game;
    out-of-range indices yield zero rows."""
    B, N = arr.shape[:2]
    oh = jax.nn.one_hot(idx, N, dtype=arr.dtype)            # (B, K, N)
    return jnp.einsum("bkn,bnx->bkx", oh, arr,
                      preferred_element_type=arr.dtype)


def rows_scatter_add(arr: jax.Array, idx: jax.Array,
                     vals: jax.Array) -> jax.Array:
    """``arr (B, N, X) += scatter(idx (B, K), vals (B, K, X))`` as one
    einsum.  Exact when each game's ``idx`` row has no duplicates (a tree
    path visits each node once); out-of-range indices are dropped.

    Kept in the array dtype end-to-end so backup accumulation is exact
    (bf16 value rounding here measurably changes Q and breaks cross-engine
    equality for no speed gain).
    """
    B, N = arr.shape[:2]
    oh = jax.nn.one_hot(idx, N, dtype=arr.dtype)            # (B, K, N)
    return arr + jnp.einsum("bkn,bkx->bnx", oh, vals.astype(arr.dtype),
                            preferred_element_type=arr.dtype)


def pick(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``arr (B, A), idx (B,) -> (B,)`` — small per-row select."""
    A = arr.shape[1]
    oh = jax.nn.one_hot(idx, A, dtype=arr.dtype)
    return jnp.einsum("ba,ba->b", oh, arr,
                      preferred_element_type=arr.dtype)

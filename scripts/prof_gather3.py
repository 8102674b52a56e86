"""Tiled sublane gather vs one-hot contraction, on-chip timing.

Mosaic lowers jnp.take_along_axis(x, idx, axis=0) when x has exactly 8
sublanes (one native f32 tile).  Build an (N, B) gather from that:
sub = idx & 7 within-tile gather per 8-row tile, then mask-select by
tile id.  Measures both and checks exactness.
"""
import sys
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, A, B = 200, 7, 512
T = N // 8 + (1 if N % 8 else 0)
REPS = 100


def _iota(n, b):
    return jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)


def probe_shapes():
    """Which (rows_x, rows_idx) combos lower?"""
    for (nx, ni) in [(8, 7), (8, 1), (8, 16), (16, 8), (8, 8)]:
        x = jnp.asarray(np.random.rand(nx, B), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, nx, (ni, B)), jnp.int32)

        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((ni, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        try:
            o = np.asarray(f(x, idx))
            ok = np.allclose(o, np.take_along_axis(
                np.asarray(x), np.asarray(idx), axis=0))
            print(f"x({nx},B) idx({ni},B): ok={ok}")
        except Exception as e:
            print(f"x({nx},B) idx({ni},B): FAILED {type(e).__name__}")


def tiled_gather(x, idx, n_rows):
    """x (N, B) f32, idx (A, B) int32 in [0, n_rows) → (A, B)."""
    sub = jnp.bitwise_and(idx, 7)
    tile = jnp.right_shift(idx, 3)
    out = jnp.zeros(idx.shape, x.dtype)
    for t in range((n_rows + 7) // 8):
        g = jnp.take_along_axis(x[t * 8:(t + 1) * 8, :], sub, axis=0)
        out = jnp.where(tile == t, g, out)
    return out


def k_tiled(x_ref, v_ref, i_ref, o_ref):
    x, v, idx = x_ref[:], v_ref[:], i_ref[:]
    acc = jnp.zeros((A, B), jnp.float32)
    for _ in range(REPS):
        acc = acc + tiled_gather(x, idx, N) + tiled_gather(v, idx, N)
        idx = (idx + 1) % N
    o_ref[:] = acc


def k_onehot(x_ref, v_ref, i_ref, o_ref):
    x, v, idx = x_ref[:], v_ref[:], i_ref[:]
    acc = jnp.zeros((A, B), jnp.float32)
    for _ in range(REPS):
        rows = []
        for a in range(A):
            oh = (_iota(N, B) == idx[a:a + 1, :]).astype(jnp.float32)
            rows.append(jnp.sum(x * oh, axis=0, keepdims=True)
                        + jnp.sum(v * oh, axis=0, keepdims=True))
        acc = acc + jnp.concatenate(rows, axis=0)
        idx = (idx + 1) % N
    o_ref[:] = acc


def run(kern, tag):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, B), jnp.float32)
    v = jnp.asarray(rs.rand(N, B), jnp.float32)
    idx = jnp.asarray(rs.randint(0, N, (A, B)), jnp.int32)
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((A, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    try:
        o = f(x, v, idx)
        s = float(o.sum())
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        o = f(x, v, idx)
    s = float(o.sum())
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"[{tag}] {dt*1e6:.2f} us/step-gather-pair  (sum {s:.1f})")


if __name__ == "__main__":
    probe_shapes()
    run(k_tiled, "tiled")
    run(k_onehot, "one-hot")

"""Probe: does Mosaic lower a lane-varying sublane gather
(jnp.take_along_axis along axis 0) inside a Pallas TPU kernel, and how
fast is it vs the one-hot contraction the descent loop uses today?

The descent's per-step child-stat gather is cvisit[a, b] = visit[crow[a,b], b]
— today an unrolled one-hot multiply+reduce per action (~3·A·N·B VPU work).
A hardware gather would cost ~A·B.
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, A, B = 200, 8, 512
REPS = 200  # chained reps inside the kernel for device-rate timing


def _iota(n, b):
    return jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)


def k_gather(x_ref, idx_ref, o_ref):
    x = x_ref[:]
    idx = idx_ref[:]
    acc = jnp.zeros((A, B), jnp.float32)
    for _ in range(REPS):
        g = jnp.take_along_axis(x, idx, axis=0)        # (A, B)
        acc = acc + g
        idx = (idx + 1) % N
    o_ref[:] = acc


def k_onehot(x_ref, idx_ref, o_ref):
    x = x_ref[:]
    idx = idx_ref[:]
    acc = jnp.zeros((A, B), jnp.float32)
    for _ in range(REPS):
        rows = []
        for a in range(A):
            oh = (_iota(N, B) == idx[a:a + 1, :]).astype(jnp.float32)
            rows.append(jnp.sum(x * oh, axis=0, keepdims=True))
        acc = acc + jnp.concatenate(rows, axis=0)
        idx = (idx + 1) % N
    o_ref[:] = acc


def run(kern, tag):
    x = jnp.asarray(np.random.RandomState(0).rand(N, B), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, N, (A, B)),
                      jnp.int32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((A, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        o = f(x, idx)
        s = float(o.sum())
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None, None
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        o = f(x, idx)
    s = float(o.sum())
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"[{tag}] {dt*1e6:.2f} us/gather  (sum {s:.1f})")
    return dt, s


def ref_value():
    x = np.asarray(np.random.RandomState(0).rand(N, B), np.float32)
    idx = np.asarray(np.random.RandomState(1).randint(0, N, (A, B)))
    acc = np.zeros((A, B), np.float32)
    for _ in range(REPS):
        acc += np.take_along_axis(x, idx, axis=0)
        idx = (idx + 1) % N
    return float(acc.sum())


if __name__ == "__main__":
    print("expected sum:", ref_value())
    run(k_gather, "take_along_axis")
    run(k_onehot, "one-hot")

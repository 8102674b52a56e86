"""Probe variants of in-kernel dynamic gather for Mosaic lowering."""
import sys
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, A, B = 200, 8, 512


def probe(tag, kern, shapes, expect):
    args = [jnp.asarray(a) for a in shapes]
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(expect.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        o = np.asarray(f(*args))
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:160]}")
        return False
    ok = np.allclose(o, expect)
    print(f"[{tag}] ok={ok}")
    return ok


rs = np.random.RandomState(0)
x = rs.rand(N, B).astype(np.float32)
idx = rs.randint(0, N, (A, B)).astype(np.int32)
idx1 = idx[0:1]

# 1. row-at-a-time take_along_axis (A rows of (1, B) each)
def k1(x_ref, i_ref, o_ref):
    rows = [jnp.take_along_axis(x_ref[:], i_ref[a:a+1, :], axis=0)
            for a in range(A)]
    o_ref[:] = jnp.concatenate(rows, axis=0)

probe("row-at-a-time axis0", k1, [x, idx],
      np.take_along_axis(x, idx, axis=0))

# 2. gather along LANES: xT (B, N) padded to (B, 256), idx (B, A)
xT = np.zeros((B, 256), np.float32); xT[:, :N] = x.T
idxT = idx.T.copy()  # (B, A)
def k2(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

probe("lane-dim axis1", k2, [xT, idxT],
      np.take_along_axis(xT, idxT, axis=1))

# 3. fancy indexing x[idx, lane_iota]
def k3(x_ref, i_ref, o_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (A, B), 1)
    o_ref[:] = x_ref[:][i_ref[:], lanes]

probe("fancy-index", k3, [x, idx], np.take_along_axis(x, idx, axis=0))

# 4. small sublane extent: x8 (8, B), idx in [0, 8)
x8 = rs.rand(8, B).astype(np.float32)
idx8 = (idx % 8).astype(np.int32)
def k4(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

probe("axis0 N=8", k4, [x8, idx8], np.take_along_axis(x8, idx8, axis=0))

# 5. take_along_axis where idx rows == x rows (N, B) full permutation shape
idxN = rs.randint(0, N, (N, B)).astype(np.int32)
def k5(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

probe("axis0 full-N", k5, [x, idxN], np.take_along_axis(x, idxN, axis=0))

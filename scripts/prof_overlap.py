"""Does Mosaic overlap MXU matmuls with independent VPU work?

Times three kernels: a matmul chain (MXU), a one-hot-reduction chain (VPU,
shaped like the search descent), and both interleaved with NO data
dependencies between them.  If interleaved ~= max(mxu, vpu), the half-batch
pipelined search (one half's forward under the other half's descent) is
worth building; if ~= sum, it is not.
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

from alphazero_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

D, B, N = 512, 512, 200
REPS = 24


def mxu_chain(w_ref, x):
    def body(i, x):
        return jnp.dot(w_ref[:], x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * 1e-3
    return jax.lax.fori_loop(0, REPS, body, x)


def vpu_chain(stats_ref, node0):
    # descent-shaped work: one-hot compare + mask + reduce over (N, B)
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)

    def body(i, carry):
        node, acc = carry
        oh = (ids == node).astype(jnp.float32)
        v = jnp.sum(stats_ref[:] * oh, axis=0, keepdims=True)   # (1, B)
        v2 = jnp.sum(stats_ref[:] * oh * 2.0, axis=0, keepdims=True)
        node = (node + v.astype(jnp.int32) + i) % N
        return node, acc + v2
    _, acc = jax.lax.fori_loop(0, REPS, body, (node0, jnp.zeros((1, B))))
    return acc


def k_mxu(w_ref, x_ref, s_ref, o1, o2):
    o1[:] = mxu_chain(w_ref, x_ref[:])
    o2[:] = jnp.zeros((1, B), jnp.float32)


def k_vpu(w_ref, x_ref, s_ref, o1, o2):
    o1[:] = x_ref[:]
    o2[:] = vpu_chain(s_ref, jnp.zeros((1, B), jnp.int32))


def k_both(w_ref, x_ref, s_ref, o1, o2):
    # independent interleave: one fori_loop carrying BOTH chains
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)

    def body(i, carry):
        x, node, acc = carry
        x = jnp.dot(w_ref[:], x.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * 1e-3
        oh = (ids == node).astype(jnp.float32)
        v = jnp.sum(s_ref[:] * oh, axis=0, keepdims=True)
        v2 = jnp.sum(s_ref[:] * oh * 2.0, axis=0, keepdims=True)
        node = (node + v.astype(jnp.int32) + i) % N
        return x, node, acc + v2
    x, _, acc = jax.lax.fori_loop(
        0, REPS, body,
        (x_ref[:], jnp.zeros((1, B), jnp.int32), jnp.zeros((1, B))))
    o1[:] = x
    o2[:] = acc


def run(kernel, tag, n=8):
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((D, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        in_specs=[vspec] * 3,
        out_specs=(vspec, vspec),
    )
    w = jnp.asarray(np.random.RandomState(0).randn(D, D), jnp.bfloat16)
    x = jnp.ones((D, B), jnp.float32)
    s = jnp.ones((N, B), jnp.float32)
    g = jax.jit(lambda: f(w, x, s))
    o = g()
    float(o[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        o = g()
    float(o[0].sum()) + float(o[1].sum())
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] {dt*1e6:.0f} us/kernel", flush=True)
    return dt


if __name__ == "__main__" and len(sys.argv) == 1:
    m = run(k_mxu, "mxu-only")
    v = run(k_vpu, "vpu-only")
    b = run(k_both, "interleaved")
    print(f"sum={1e6*(m+v):.0f} us, max={1e6*max(m,v):.0f} us, "
          f"both={1e6*b:.0f} us -> overlap "
          f"{'YES' if b < 0.75*(m+v) else 'NO'}")


# ---------------------------------------------------------------------------
# phase 2: what kills the overlap in the real kernel?
#   a) VPU chain containing while_loops (descend/backup are scf.while)
#   b) VPU chain writing refs between matmuls
# ---------------------------------------------------------------------------

def k_both_while(w_ref, x_ref, s_ref, o1, o2):
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)

    def body(i, carry):
        x, node, acc = carry
        x = jnp.dot(w_ref[:], x.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * 1e-3

        def wcond(c):
            return c[0] < 4

        def wbody(c):
            d, node, acc = c
            oh = (ids == node).astype(jnp.float32)
            v = jnp.sum(s_ref[:] * oh, axis=0, keepdims=True)
            node = (node + v.astype(jnp.int32) + d) % N
            return d + 1, node, acc + v

        _, node, acc = jax.lax.while_loop(wcond, wbody, (0, node, acc))
        return x, node, acc
    x, _, acc = jax.lax.fori_loop(
        0, REPS, body,
        (x_ref[:], jnp.zeros((1, B), jnp.int32), jnp.zeros((1, B))))
    o1[:] = x
    o2[:] = acc


def k_vpu_while(w_ref, x_ref, s_ref, o1, o2):
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)

    def body(i, carry):
        node, acc = carry

        def wcond(c):
            return c[0] < 4

        def wbody(c):
            d, node, acc = c
            oh = (ids == node).astype(jnp.float32)
            v = jnp.sum(s_ref[:] * oh, axis=0, keepdims=True)
            node = (node + v.astype(jnp.int32) + d) % N
            return d + 1, node, acc + v

        _, node, acc = jax.lax.while_loop(wcond, wbody, (0, node, acc))
        return node, acc
    _, acc = jax.lax.fori_loop(
        0, REPS, body, (jnp.zeros((1, B), jnp.int32), jnp.zeros((1, B))))
    o1[:] = x_ref[:]
    o2[:] = acc


def main2():
    v = run(k_vpu_while, "vpu-while-only")
    b = run(k_both_while, "interleaved-while")
    m = run(k_mxu, "mxu-only(again)")
    print(f"while: vpu={1e6*v:.0f} both={1e6*b:.0f} mxu={1e6*m:.0f} -> "
          f"overlap {'YES' if b < 0.75*(m+v) else 'NO'}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "p2":
    main2()


# ---------------------------------------------------------------------------
# phase 3: does a REF WRITE in the VPU chain fence the MXU pipeline?
# ---------------------------------------------------------------------------

def k_warm(w_ref, x_ref, s_ref, o1, o2):
    o1[:] = x_ref[:] * 2.0
    o2[:] = jnp.zeros((1, B), jnp.float32)


def make_refwrite(with_mxu):
    def kernel(w_ref, x_ref, s_ref, o1, o2):
        ids = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)

        def body(i, carry):
            x, node, acc = carry
            if with_mxu:
                x = jnp.dot(w_ref[:], x.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * 1e-3
            oh = (ids == node).astype(jnp.float32)
            v = jnp.sum(s_ref[:] * oh, axis=0, keepdims=True)
            o2[:] = v                                 # REF WRITE each iter
            node = (node + v.astype(jnp.int32) + i) % N
            return x, node, acc + v
        x, _, acc = jax.lax.fori_loop(
            0, REPS, body,
            (x_ref[:], jnp.zeros((1, B), jnp.int32), jnp.zeros((1, B))))
        o1[:] = x
        o2[:] = acc
    return kernel


def main3():
    run(k_warm, "warmup-discard")        # first-run pollution absorber
    m = run(k_mxu, "mxu-only")
    v = run(make_refwrite(False), "vpu-refwrite-only")
    b = run(make_refwrite(True), "interleaved-refwrite")
    print(f"refwrite: mxu={1e6*m:.0f} vpu={1e6*v:.0f} both={1e6*b:.0f} -> "
          f"overlap {'YES' if b < 0.75*(m+v) else 'NO'}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "p3":
    main3()

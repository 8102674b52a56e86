"""Fused ResNet tower inference kernel (kept OFF by default — measured
SLOWER than XLA's conv emitter; see verdict below).

This kernel computes the ENTIRE conv tower in one launch with all
activations VMEM-resident, in a TRANSPOSED channels-in-sublanes layout:
activations are ``(C, B·RC)`` with the (game, cell) axis in TPU lanes.

VERDICT (measured on v5e, scripts/prof_resnet_fwd.py, device-rate timing
via 10-deep on-chip forward chains; round 3):

    config               flax/XLA conv      this kernel
    connect4-resnet 64x4   252 us = 50.6 TF   364 us = 35.0 TF
    gomoku9       128x8    864 us = 113 TF   1017 us = 96.3 TF
    gomoku15      192x10  5564 us = 137 TF   (VMEM-gated out)

XLA's TPU conv emitter reaches 57-70% MFU at benchmark sizes — the
round-1 "33-53% MFU" attributed to the conv forward was actually per-sim
SEARCH overhead in the surrounding loop.  The 9-tap shift+mask VPU work
of this formulation eats its MXU margin, so the XLA forward stays the
production eval for the resnet family; the eval-bound configs' real
lever is leaf batching (bigger eval batches, fewer search rounds).
``AZ_FUSED_RESNET=1`` opt-in keeps the kernel testable end-to-end.

Why transposed: a 3×3 SAME conv decomposes into 9 shifted matmuls.  In
the row-major ``(B·RC, C)`` layout each tap dot is (Mb, C)·(C, C) — K=N=C,
which for C≤128 drives a fraction of the MXU (measured 10% of peak at
C=64, LOSING to the XLA conv).  Transposed, each tap is
``W_t (C, C) @ h_s (C, Mb)`` — M=K=C sublane-aligned, so C=128 towers run
the full MXU height with lanes streaming, and the 9-tap im2col
concatenation (used when the buffer fits) lands on the cheap SUBLANE dim.
Shifts along the flattened (game, cell) lane axis move cells by
(dr, dc); rows whose source crosses a board edge (equivalently a game
boundary) are zeroed by a per-cell mask, exactly reproducing zero
padding.  Per-cell channel LayerNorm is a sublane reduction per lane (the
reason the model uses it — see models/resnet.py).  The tiny policy/value
heads stay in XLA on the kernel's output features.

Mosaic compile time: the residual blocks run under a ``fori_loop`` with
block weights gathered by dynamic index on the leading dim, so the
compiled code size is ONE block body regardless of depth (a round-2
fully-unrolled form exceeded 10 minutes through the remote-compile
service at 8 blocks).

Inference-only (training keeps the flax forward).  Wired into the eval
path by models.make_eval_fn for the resnet family on TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _conv_masks_t(rows: int, cols: int, games_per_block: int) -> np.ndarray:
    """(9, games_per_block·RC) validity mask per tap: 1 where the shifted
    source cell lies on the board."""
    RC = rows * cols
    m = np.zeros((9, RC), np.float32)
    for cell in range(RC):
        r, c = divmod(cell, cols)
        for t, (dr, dc) in enumerate(TAPS):
            if 0 <= r + dr < rows and 0 <= c + dc < cols:
                m[t, cell] = 1.0
    return np.tile(m, (1, games_per_block))


def _kernel(rows, cols, channels, blocks, feat_in, im2col,
            x_ref, mask_ref, wstem_ref, wblk_ref, lns_ref, out_ref):
    """One grid step processes one game-aligned lane block (·, Mb)."""

    def conv(h, w, cin):
        """h (cin, Mb) f32, w (C, 9·cin) bf16 → (C, Mb) f32.

        ``im2col``: concatenate the 9 shifted/masked tap copies on the
        SUBLANE dim and contract in one K=9·cin dot (fewer MXU issues);
        otherwise accumulate per-tap dots lazily — at gomoku15 sizes the
        (9C, Mb) buffer would not fit VMEM.  Shifts run on f32 (Mosaic's
        rotate only supports 32-bit data); operands cast to bf16 at the
        dot."""
        M = h.shape[1]
        parts, acc = [], None
        for t, (dr, dc) in enumerate(TAPS):
            off = (dr * cols + dc) % M     # left-shift: lane i reads i+off
            hs = pltpu.roll(h, (-off) % M, 1) if off != 0 else h
            hs = (hs * mask_ref[t:t + 1, :]).astype(jnp.bfloat16)
            if im2col:
                parts.append(hs)
            else:
                y = jnp.dot(w[:, t * cin:(t + 1) * cin], hs,
                            preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        if im2col:
            return jnp.dot(w, jnp.concatenate(parts, axis=0),
                           preferred_element_type=jnp.float32)
        return acc

    def ln(h, scale, bias):
        mu = jnp.mean(h, axis=0, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=0, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    x = x_ref[:]                                             # (F, Mb)
    h = jnp.maximum(ln(conv(x, wstem_ref[:], feat_in),
                       lns_ref[0, 0], lns_ref[0, 1]), 0.0)

    def block(b, h):
        # weights/LN params gathered by dynamic leading-dim index — the
        # loop body compiles ONCE for any tower depth
        y = conv(h, wblk_ref[b, 0], channels)
        y = jnp.maximum(ln(y, lns_ref[1 + 2 * b, 0],
                           lns_ref[1 + 2 * b, 1]), 0.0)
        y = conv(y, wblk_ref[b, 1], channels)
        y = ln(y, lns_ref[2 + 2 * b, 0], lns_ref[2 + 2 * b, 1])
        return jnp.maximum(h + y, 0.0)

    h = jax.lax.fori_loop(0, blocks, block, h)
    out_ref[:] = h.astype(out_ref.dtype)


def prepare_weights(params, blocks: int):
    """Flax ResNet params → transposed kernel weight arrays.

    Returns (wstem (C, 9F) bf16, wblk (blocks, 2, C, 9C) bf16,
    lns (1+2·blocks, 2, C, 1) f32).  Tap order matches TAPS; matmul
    weights pre-cast to bf16 (halves VMEM, matches the flax compute
    dtype)."""
    def taps_t(kernel):  # (3, 3, cin, cout) → (cout, 9·cin)
        k3, k3b, cin, cout = kernel.shape
        return jnp.concatenate(
            [kernel[dr + 1, dc + 1].T for (dr, dc) in TAPS],
            axis=1).astype(jnp.bfloat16)

    wstem = taps_t(params["stem"]["kernel"])
    wblk = jnp.stack([
        jnp.stack([taps_t(params[f"block_{b}"]["conv1"]["kernel"]),
                   taps_t(params[f"block_{b}"]["conv2"]["kernel"])])
        for b in range(blocks)
    ])
    lns = [jnp.stack([params["stem_ln"]["scale"], params["stem_ln"]["bias"]])]
    for b in range(blocks):
        lns.append(jnp.stack([params[f"block_{b}"]["ln1"]["scale"],
                              params[f"block_{b}"]["ln1"]["bias"]]))
        lns.append(jnp.stack([params[f"block_{b}"]["ln2"]["scale"],
                              params[f"block_{b}"]["ln2"]["bias"]]))
    return wstem, wblk, jnp.stack(lns).astype(jnp.float32)[..., None]


def _vmem_per_lane(F: int, C: int, im2col: bool) -> int:
    """Accounted VMEM bytes per activation lane inside one grid step."""
    base = 4 * F + 64 + 12 * C + 4 * C   # x, mask(9→pad), h/y/out f32, tap
    return base + 40 * C if im2col else base


_VMEM_BUDGET = 30_000_000


def _plan_blocks(B: int, RC: int, F: int, C: int):
    """(games_per_block, use_im2col) for the lane-block grid."""
    fits = lambda g, cat: g * RC * _vmem_per_lane(F, C, cat) <= _VMEM_BUDGET
    if fits(B, True):
        return B, True            # single block: no alignment constraint
    g_align = 128 // int(np.gcd(RC, 128))
    cands = [g for g in range(g_align, B, g_align) if B % g == 0]
    for cat in (True, False):
        ok = [g for g in cands if fits(g, cat)]
        if ok:
            return max(ok), cat
    if fits(B, False):
        return B, False
    return (cands[0] if cands else B), False   # over budget: best effort


def supports_fused_resnet(model, batch: int) -> bool:
    """Opt-in only (``AZ_FUSED_RESNET=1``): the XLA conv emitter beats
    this kernel at every benchmark size (see module docstring).  When
    opted in: TPU, sublane-tileable channels ≥ 64, and weights + one
    lane-block of activations inside scoped VMEM."""
    if not os.environ.get("AZ_FUSED_RESNET"):
        return False
    if model.channels % 8 != 0 or model.channels < 64:
        return False
    C = model.channels
    RC = model.rows * model.cols
    weight_bytes = 2 * 9 * C * C * 2 * model.blocks + 2 * 9 * C * 8
    g_align = 128 // int(np.gcd(RC, 128))
    act_bytes = g_align * RC * _vmem_per_lane(model.channels_in, C, False)
    if weight_bytes + act_bytes > 75_000_000:
        return False      # gomoku15-class: minimum aligned block over VMEM
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def make_fused_apply(env, channels: int, blocks: int,
                     interpret: bool = False):
    """Drop-in replacement for ``model.apply`` (deterministic inference):
    ``fused(params, obs (B, F, R, C)) -> (policy_logits, value)``.

    Evaluators that call the forward inside a simulation loop should pack
    once and reuse: ``packed = fused.pack(params)`` then
    ``fused.apply_packed(packed, obs)`` — packing per call costs a
    per-simulation weight restack.  ``env`` supplies only geometry — an
    env or a ResNet module (rows/cols + feature_dim/channels_in) both
    work."""
    rows, cols = env.rows, env.cols
    RC = rows * cols
    F = getattr(env, "feature_dim", None) or env.channels_in
    C = channels

    def pack(params):
        wstem, wblk, lns = prepare_weights(params, blocks)
        hp = params
        return dict(
            wstem=wstem, wblk=wblk, lns=lns,
            pconv_k=hp["policy_conv"]["kernel"].reshape(C, 2),
            pconv_b=hp["policy_conv"]["bias"],
            vconv_k=hp["value_conv"]["kernel"].reshape(C, 1),
            vconv_b=hp["value_conv"]["bias"],
            ph_k=hp["policy_head"]["kernel"], ph_b=hp["policy_head"]["bias"],
            vf_k=hp["value_fc"]["kernel"], vf_b=hp["value_fc"]["bias"],
            vh_k=hp["value_head"]["kernel"], vh_b=hp["value_head"]["bias"],
        )

    def apply_packed(pk, obs):
        B = obs.shape[0]
        # lane-block sizing: whole games per grid step; a multi-step grid
        # needs block lane counts ≡ 0 mod 128 (g·RC ≡ 0), a single block
        # has no alignment constraint.  The im2col buffer (9C, Mb) bf16 is
        # used when it fits the VMEM budget (one big K=9C dot per conv);
        # otherwise per-tap accumulation (full MXU height anyway once
        # C ≥ 128).  Accounting per lane: x + mask + 3 f32 activations +
        # tap temp, + im2col buffer and its live parts on the cat path.
        g, im2col = _plan_blocks(B, RC, F, C)
        games_per_block = g
        m_block = games_per_block * RC
        n_blocks = (B * RC) // m_block
        masks = jnp.asarray(_conv_masks_t(rows, cols, games_per_block))

        # (B, F, R, C) → (F, B·RC): channels in sublanes, cells in lanes
        x = obs.astype(jnp.float32).reshape(B, F, RC) \
            .transpose(1, 0, 2).reshape(F, B * RC)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        feat = pl.pallas_call(
            functools.partial(_kernel, rows, cols, C, blocks, F, im2col),
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((C, B * RC), jnp.float32),
            in_specs=[
                pl.BlockSpec((F, m_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                full(masks.shape),
                full(pk["wstem"].shape),
                full(pk["wblk"].shape),
                full(pk["lns"].shape),
            ],
            out_specs=pl.BlockSpec((C, m_block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, masks, pk["wstem"], pk["wblk"], pk["lns"])

        # heads in XLA on the (C, B·RC) features; (B·RC, k) transposes of
        # the tiny head outputs replace any big activation transpose
        p = jnp.maximum(pk["pconv_k"].T @ feat
                        + pk["pconv_b"][:, None], 0.0)     # (2, B·RC)
        p = p.T.reshape(B, RC * 2)         # == NHWC (B,R,C,2).reshape(B,-1)
        logits = p @ pk["ph_k"] + pk["ph_b"]
        v = jnp.maximum(pk["vconv_k"].T @ feat
                        + pk["vconv_b"][:, None], 0.0)     # (1, B·RC)
        v = v.reshape(B, RC)
        v = jnp.maximum(v @ pk["vf_k"] + pk["vf_b"], 0.0)
        value = jnp.tanh(v @ pk["vh_k"] + pk["vh_b"])[:, 0]
        return logits, value

    def fused(params, obs):
        return apply_packed(pack(params), obs)

    fused.pack = pack
    fused.apply_packed = apply_packed
    return fused

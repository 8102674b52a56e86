"""Fused ResNet tower inference kernel.

The XLA forward of the benchmark ResNet spends more time on per-op overhead
than on FLOPs at these board sizes (measured: 32ch and 64ch towers cost
94µs vs 152µs for 4× the FLOPs).  This kernel computes the ENTIRE conv
tower in one launch with all activations VMEM-resident.

Formulation: activations are ``(B·RC, C)`` rows ordered (game, cell).  A
3×3 SAME conv is 9 shifted matmuls: ``y = Σ_tap (roll(x, -off_tap) ·
mask_tap) @ W_tap`` — rolling the flattened row dimension moves cells by
(dr, dc); rows whose source crosses a board edge (equivalently a game
boundary) are zeroed by a per-cell mask, exactly reproducing zero padding.
Per-cell channel LayerNorm is a lane reduction per row (the reason the
model uses it — see models/resnet.py).  The tiny policy/value heads stay
in XLA on the kernel's output features.

Inference-only (training keeps the flax forward).  Currently NOT wired
into the hot path: the Mosaic compile of this kernel exceeds 10 minutes
through the environment's mandatory remote-compile service.  It is kept
(with interpret-mode equivalence tests) as the next-round speed path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _conv_masks(rows: int, cols: int, games_per_block: int) -> np.ndarray:
    """(games_per_block·RC, 9) validity mask per tap: 1 where the shifted
    source cell lies on the board."""
    RC = rows * cols
    m = np.zeros((RC, 9), np.float32)
    for cell in range(RC):
        r, c = divmod(cell, cols)
        for t, (dr, dc) in enumerate(TAPS):
            if 0 <= r + dr < rows and 0 <= c + dc < cols:
                m[cell, t] = 1.0
    return np.tile(m, (games_per_block, 1))


def _kernel(rows, cols, channels, blocks, feat_in,
            x_ref, mask_ref, wstem_ref, wblk_ref, lns_ref, out_ref):
    """One grid step processes one game-aligned row block (Mb, ·)."""

    def conv(h, w_taps, cin):
        """h (Mb, cin) f32 → (Mb, C) f32; w_taps (9·cin, C).

        Rolls run on f32 (Mosaic's rotate only supports 32-bit data);
        the matmul operands are cast to bf16 at the dot.
        """
        acc = None
        M = h.shape[0]
        h = h.astype(jnp.float32)
        for t, (dr, dc) in enumerate(TAPS):
            off = (-(dr * cols + dc)) % M  # pltpu.roll wants shift >= 0
            hs = pltpu.roll(h, off, 0) if off != 0 else h
            hs = (hs * mask_ref[:, t:t + 1]).astype(jnp.bfloat16)
            w = w_taps[t * cin:(t + 1) * cin, :].astype(jnp.bfloat16)
            y = jnp.dot(hs, w, preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc

    def ln(h, idx):
        scale = lns_ref[idx, 0:1, :]
        bias = lns_ref[idx, 1:2, :]
        mu = jnp.mean(h, axis=1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    x = x_ref[:]                                             # (Mb, F)
    h = jnp.maximum(ln(conv(x, wstem_ref[:], feat_in), 0), 0.0)
    for b in range(blocks):
        y = conv(h, wblk_ref[b, 0], channels)
        y = jnp.maximum(ln(y, 1 + 2 * b), 0.0)
        y = conv(y, wblk_ref[b, 1], channels)
        y = ln(y, 2 + 2 * b)
        h = jnp.maximum(h + y, 0.0)
    out_ref[:] = h.astype(out_ref.dtype)


def prepare_weights(params, blocks: int):
    """Flax ResNet params → kernel weight arrays.

    Returns (wstem (9F, C), wblk (blocks, 2, 9C, C), lns (1+2·blocks, 2, C))
    plus the head params (used in XLA).
    """
    def taps(kernel):  # (3, 3, cin, cout) → (9·cin, cout)
        k3, k3b, cin, cout = kernel.shape
        return kernel.reshape(9 * cin, cout)

    wstem = taps(params["stem"]["kernel"])
    wblk = jnp.stack([
        jnp.stack([taps(params[f"block_{b}"]["conv1"]["kernel"]),
                   taps(params[f"block_{b}"]["conv2"]["kernel"])])
        for b in range(blocks)
    ])
    lns = [jnp.stack([params["stem_ln"]["scale"], params["stem_ln"]["bias"]])]
    for b in range(blocks):
        lns.append(jnp.stack([params[f"block_{b}"]["ln1"]["scale"],
                              params[f"block_{b}"]["ln1"]["bias"]]))
        lns.append(jnp.stack([params[f"block_{b}"]["ln2"]["scale"],
                              params[f"block_{b}"]["ln2"]["bias"]]))
    return wstem, wblk, jnp.stack(lns)


def make_fused_apply(env, channels: int, blocks: int,
                     interpret: bool = False):
    """Drop-in replacement for ``model.apply`` (deterministic inference):
    ``fused(params, obs (B, F, R, C)) -> (policy_logits, value)``.
    Params are consumed per call so the evaluator works inside jitted
    loops with traced parameters."""
    rows, cols = env.rows, env.cols
    RC = rows * cols
    F = env.feature_dim
    C = channels

    def fused(params, obs):
        wstem, wblk, lns = prepare_weights(params, blocks)
        hp = params  # heads stay in XLA
        pconv_k = hp["policy_conv"]["kernel"].reshape(C, 2)
        pconv_b = hp["policy_conv"]["bias"]
        vconv_k = hp["value_conv"]["kernel"].reshape(C, 1)
        vconv_b = hp["value_conv"]["bias"]
        B = obs.shape[0]
        # small blocks: the unrolled taps keep several live (Mb, C)
        # vectors; ~2K rows keeps the Mosaic stack well inside VMEM
        games_per_block = max(1, min(B, 2048 // RC))
        while B % games_per_block:
            games_per_block -= 1
        m_block = games_per_block * RC
        n_blocks = (B * RC) // m_block
        masks = jnp.asarray(_conv_masks(rows, cols, games_per_block))

        x = obs.astype(jnp.float32).transpose(0, 2, 3, 1).reshape(B * RC, F)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        feat = pl.pallas_call(
            functools.partial(_kernel, rows, cols, C, blocks, F),
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((B * RC, C), jnp.float32),
            in_specs=[
                pl.BlockSpec((m_block, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(masks.shape),
                full(wstem.shape),
                full(wblk.shape),
                full(lns.shape),
            ],
            out_specs=pl.BlockSpec((m_block, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, masks, wstem, wblk, lns)

        feat = feat.reshape(B, RC, C)
        p = jnp.maximum(feat @ pconv_k + pconv_b, 0.0).reshape(B, RC * 2)
        logits = p @ hp["policy_head"]["kernel"] + hp["policy_head"]["bias"]
        v = jnp.maximum(feat @ vconv_k + vconv_b, 0.0).reshape(B, RC)
        v = jnp.maximum(v @ hp["value_fc"]["kernel"] + hp["value_fc"]["bias"],
                        0.0)
        value = jnp.tanh(v @ hp["value_head"]["kernel"]
                         + hp["value_head"]["bias"])[:, 0]
        return logits, value

    return fused

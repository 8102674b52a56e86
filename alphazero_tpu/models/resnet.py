"""Convolutional ResNet policy/value tower.

The reference ships only a ViT (ai/nn.py); BASELINE.json's benchmark configs
call for conv/ResNet policy/value nets ("small conv net" for tictactoe,
"deeper ResNet" for gomoku).  This is the classic AlphaZero tower: conv stem,
N residual blocks, small conv policy/value heads.

Normalization is per-cell channel LayerNorm (ConvNeXt-style) rather than
BatchNorm/GroupNorm: statistics are local to each board cell, so the network
stays state-free under jitted self-play AND the fused Pallas inference
kernel (ops/pallas_resnet.py) can normalize row-wise without cross-row
segment reductions.  Activations run in ``compute_dtype`` (bfloat16 on
TPU), parameters float32, heads in float32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ResBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(y)
        return nn.relu(x + y)


class ResNet(nn.Module):
    """Input ``(B, channels_in, rows, cols)`` float32 NCHW;
    returns ``(policy_logits (B, A), value (B,))``."""

    rows: int
    cols: int
    action_dim: int
    channels_in: int
    channels: int = 64
    blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        B = x.shape[0]
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)  # NCHW → NHWC
        x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_ln")(x)
        x = nn.relu(x)
        for i in range(self.blocks):
            x = ResBlock(self.channels, self.dtype, name=f"block_{i}")(x)

        # Policy head: 1×1 conv → 2 planes → dense over the board.
        p = nn.Conv(2, (1, 1), dtype=self.dtype, name="policy_conv")(x)
        p = nn.relu(p).reshape(B, -1).astype(jnp.float32)
        logits = nn.Dense(self.action_dim, name="policy_head")(p)

        # Value head: 1×1 conv → 1 plane → dense → scalar tanh.
        v = nn.Conv(1, (1, 1), dtype=self.dtype, name="value_conv")(x)
        v = nn.relu(v).reshape(B, -1).astype(jnp.float32)
        v = nn.relu(nn.Dense(self.channels, name="value_fc")(v))
        value = jnp.tanh(nn.Dense(1, name="value_head")(v))[:, 0]
        return logits, value

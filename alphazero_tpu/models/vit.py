"""Vision-Transformer policy/value network (reference: ai/nn.py).

A faithful flax re-implementation of the reference ViT so that checkpoints
trained by either framework are comparable: stride-1 conv patch embedding
with ``padding = patch_size // 2`` so num_patches == rows·cols (ai/nn.py:5-19),
CLS token + learned positional embedding (ai/nn.py:21-36), pre-norm attention
blocks with exact-GELU 4× MLP (ai/nn.py:38-61), final LayerNorm, linear
policy head and tanh value head on the CLS token (ai/nn.py:63-84).

TPU numerics: activations run in ``compute_dtype`` (bfloat16 by default),
parameters stay float32; heads and the final softmax-facing logits are cast
back to float32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.embed_dim * 4, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return x + y


class ViT(nn.Module):
    """Input ``(B, channels, rows, cols)`` float32 (reference NCHW layout);
    returns ``(policy_logits (B, A), value (B,))``."""

    rows: int
    cols: int
    action_dim: int
    channels: int
    embed_dim: int = 512   # reference production config, main.py:134
    patch_size: int = 5
    num_heads: int = 8
    depth: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        B = x.shape[0]
        num_patches = self.rows * self.cols
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)  # NCHW → NHWC
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=1,
            padding=self.patch_size // 2,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, num_patches, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(1.0),
            (1, num_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(self.dtype), x],
            axis=1,
        )
        x = x + pos.astype(self.dtype)

        for i in range(self.depth):
            x = AttentionBlock(
                self.embed_dim, self.num_heads, self.dropout, self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        cls_out = x[:, 0].astype(jnp.float32)
        logits = nn.Dense(self.action_dim, name="policy_head")(cls_out)
        value = jnp.tanh(nn.Dense(1, name="value_head")(cls_out))[:, 0]
        return logits, value

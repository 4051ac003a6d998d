"""Transformer cross-attention view fusion (reference AdaPose/lib/fusion.py:27-82).

The reference keeps this module as an alternative to the cost-volume fusion
(its import is commented out of the live networks, lib/network.py:8); we
provide the TPU-native equivalent for the same experimental surface. Blocks
of cross-attention between the per-point features of the two views.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class CrossAttentionBlock(nn.Module):
    dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x, context: (B, N, C)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        c = nn.LayerNorm(dtype=self.dtype)(context)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype,
            name="attn")(h, c)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * 2, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class ViewFusion(nn.Module):
    """Bidirectional cross-attention fusion of two views' point features."""
    dim: int = 64
    depth: int = 2
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2):
        f1 = nn.Dense(self.dim, dtype=self.dtype, name="proj")(feat1)
        f2 = nn.Dense(self.dim, dtype=self.dtype, name="proj2")(feat2)
        for i in range(self.depth):
            blk12 = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                        name=f"block12_{i}")
            blk21 = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                        name=f"block21_{i}")
            f1, f2 = blk12(f1, f2), blk21(f2, f1)
        return f1, f2

"""TPU-fast batched gathers.

XLA lowers batched gathers (vmapped fancy indexing, ``take_along_axis`` with
leading batch dims) to a slow serialized path on TPU; a single flat gather
with precomputed per-batch offsets runs at HBM bandwidth (measured 140 ms ->
0.05 ms on the homography warp). Every batched point-gather in the framework
goes through these helpers.
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_gather(table, idx):
    """table: (B, M, ...trailing); idx: (B, ...) int in [0, M).
    Returns table[b, idx[b, ...]] with shape (B, *idx.shape[1:], *trailing)."""
    B, M = table.shape[0], table.shape[1]
    trailing = table.shape[2:]
    flat = table.reshape((B * M,) + trailing)
    offs = (jnp.arange(B, dtype=jnp.int32) * M).reshape((B,) + (1,) * (idx.ndim - 1))
    out = jnp.take(flat, (idx.astype(jnp.int32) + offs).reshape(-1), axis=0)
    return out.reshape(idx.shape + trailing)


def point_sample_matmul(feat, ys, xs):
    """Bilinear point sampling expressed as two matmuls (MXU instead of the
    scalar gather unit — measured ~40x faster than point gathers for N~1K).

    Bilinear interpolation is separable: out[n] = Wy[n] @ F @ Wx[n]^T with
    hat-function weight rows (two nonzeros per row). feat: (B, H, W, C);
    ys, xs: (B, N) float pixel coords. Out-of-range coords sample zero
    (grid_sample 'zeros' padding semantics). Integer coords make the weights
    one-hot, i.e. an exact gather. Returns (B, N, C).
    """
    B, H, W, C = feat.shape
    dt = feat.dtype
    iy = jnp.arange(H, dtype=jnp.float32)
    ix = jnp.arange(W, dtype=jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - iy)).astype(dt)  # (B,N,H)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - ix)).astype(dt)  # (B,N,W)
    t = jnp.einsum("bnx,byxc->bnyc", Wx, feat)   # (B, N, H, C)
    return jnp.einsum("bny,bnyc->bnc", Wy, t)

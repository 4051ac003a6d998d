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

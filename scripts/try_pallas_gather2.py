#!/usr/bin/env python
"""Probe 2: tile-aligned pallas dynamic gather from a VMEM-resident table.

idx reshaped (B, T, 8, 256) so every block satisfies Mosaic's (8,128)
divisibility; src (B, HW, C) resident per-b; out (B, T, 8, 256, C)."""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    key = jax.random.PRNGKey(0)
    B, HW, C, D = 16, 112 * 112, 32, 24
    N = HW * D
    TILE = 2048
    T = N // TILE
    table = jax.random.normal(key, (B, HW, C), jnp.bfloat16)
    idx = jax.random.randint(key, (B, T, 8, TILE // 8), 0, HW, jnp.int32)

    def xla_gather(t, ix):
        flat = t.reshape(B * HW, C)
        offs = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None, None, None]
        out = jnp.take(flat, (ix + offs).reshape(-1), axis=0)
        return out.reshape(B, T, 8, TILE // 8, C)

    gb = (B * N * C * 2 * 2) / 1e9

    def kern(idx_ref, tab_ref, out_ref):
        ix = idx_ref[0, 0].reshape(-1)
        g = jnp.take(tab_ref[0], ix, axis=0)
        out_ref[0, 0] = g.reshape(8, TILE // 8, C)

    def pallas_gather(t, ix):
        return pl.pallas_call(
            kern,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 8, TILE // 8), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, TILE // 8, C),
                                   lambda b, i: (b, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, 8, TILE // 8, C), t.dtype),
        )(ix, t)

    try:
        out = pallas_gather(table, idx)
        ref = xla_gather(table, idx)
        err = jnp.abs(out - ref).max()
        print(f"pallas take compiles, max err {err}", flush=True)
        ms = scan_bench(pallas_gather, table, idx, iters=5, reps=3)
        print(f"pallas take : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
              flush=True)
    except Exception as e:
        print(f"pallas take FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)

    ms = scan_bench(xla_gather, table, idx, iters=5, reps=3)
    print(f"XLA flat take: {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Can Mosaic gather rows from a VMEM-resident table with computed indices,
and at what speed? Compares XLA flat take vs a pallas kernel."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/scripts")
from calibrate2 import roll_bench


def main():
    key = jax.random.PRNGKey(0)
    B, HW, C = 16, 112 * 112, 32
    D = 24
    N = HW * D                      # rows gathered per sample
    table = jax.random.normal(key, (B, HW, C), jnp.bfloat16)
    idx = jax.random.randint(key, (B, N), 0, HW, jnp.int32)

    # --- XLA flat gather baseline ---
    def xla_gather(t, ix):
        flat = t.reshape(B * HW, C)
        offs = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]
        return jnp.take(flat, (ix + offs).reshape(-1), axis=0).reshape(B, N, C)

    ms = roll_bench(xla_gather, table, idx, iters=5, reps=2)
    gb = (B * N * C * 2 * 2) / 1e9
    print(f"XLA flat take   : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
          flush=True)

    # --- pallas: table block per b resident, gather a tile of rows ---
    TILE = 2048

    def kern(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def pallas_gather(t, ix):
        grid = (B, N // TILE)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE), lambda b, i: (b, i),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, HW, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, C), t.dtype),
        )(ix, t)

    try:
        out = pallas_gather(table, idx)
        ref = xla_gather(table, idx)
        err = jnp.abs(out - ref).max()
        print(f"pallas smem-idx gather compiles, max err {err}")
        ms = roll_bench(pallas_gather, table, idx, iters=5, reps=2)
        print(f"pallas gather   : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
              flush=True)
    except Exception as e:
        print(f"pallas smem-idx FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- variant: indices as VMEM int32 vector, vector gather ---
    def kern2(idx_ref, tab_ref, out_ref):
        ix = idx_ref[0, :]                       # (TILE,) int32 in VMEM
        out_ref[0] = jnp.take(tab_ref[0], ix, axis=0)

    def pallas_gather2(t, ix):
        grid = (B, N // TILE)
        return pl.pallas_call(
            kern2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE), lambda b, i: (b, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, C), t.dtype),
        )(ix, t)

    try:
        out = pallas_gather2(table, idx)
        ref = xla_gather(table, idx)
        err = jnp.abs(out - ref).max()
        print(f"pallas vmem-take gather compiles, max err {err}")
        ms = roll_bench(pallas_gather2, table, idx, iters=5, reps=2)
        print(f"pallas take     : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
              flush=True)
    except Exception as e:
        print(f"pallas vmem-take FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()

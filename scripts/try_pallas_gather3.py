#!/usr/bin/env python
"""Probe 3: equal-shape take_along_axis inside pallas (Mosaic dynamic_gather
pattern): gather (HW, C) rows from a VMEM-resident (HW, C) table with
per-row indices broadcast across lanes. Grid (B, D) = one warp depth-slice
per step, indices computed in-kernel from projection scalars."""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    key = jax.random.PRNGKey(0)
    B, S, C, D = 16, 112, 32, 24
    HW = S * S
    table = jax.random.normal(key, (B, HW, C), jnp.bfloat16)
    idx = jax.random.randint(key, (B, D, HW), 0, HW, jnp.int32)

    def xla_ref(t, ix):
        flat = t.reshape(B * HW, C)
        offs = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None, None]
        out = jnp.take(flat, (ix + offs).reshape(-1), axis=0)
        return out.reshape(B, D, HW, C)

    gb = (B * D * HW * C * 2 * 2) / 1e9

    def kern(idx_ref, tab_ref, out_ref):
        ix = idx_ref[0, 0]                                   # (HW,)
        ixb = jnp.broadcast_to(ix[:, None], (HW, C))         # per-lane idx
        out_ref[0, 0] = jnp.take_along_axis(tab_ref[0], ixb, axis=0)

    def pallas_gather(t, ix):
        return pl.pallas_call(
            kern,
            grid=(B, D),
            in_specs=[
                pl.BlockSpec((1, 1, HW), lambda b, d: (b, d, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, HW, C), lambda b, d: (b, d, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, HW, C), t.dtype),
        )(ix, t)

    try:
        out = pallas_gather(table, idx)
        ref = xla_ref(table, idx)
        err = jnp.abs(out - ref).max()
        print(f"pallas take_along_axis compiles, max err {err}", flush=True)
        ms = scan_bench(pallas_gather, table, idx, iters=5, reps=3)
        print(f"pallas taa  : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
              flush=True)
    except Exception as e:
        print(f"pallas taa FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe 4: equal-shape take_along_axis in pallas, indices computed IN-KERNEL
(as the real warp kernel would). Tests the Mosaic dynamic_gather lowering and
its speed."""
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
    if len(sys.argv) > 4:
        B, S, C, D = (int(a) for a in sys.argv[1:5])
    HW = S * S
    table = jax.random.normal(key, (B, HW, C), jnp.bfloat16)

    def make_idx(d):
        p = jnp.arange(HW, dtype=jnp.int32)
        return (p * 7919 + d * 104729) % HW

    def xla_ref(t):
        flat = t.reshape(B * HW, C)
        offs = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None, None]
        ix = jnp.stack([make_idx(d) for d in range(D)])[None]     # (1,D,HW)
        out = jnp.take(flat, (ix + offs).reshape(-1), axis=0)
        return out.reshape(B, D, HW, C)

    gb = (B * D * HW * C * 2 * 2) / 1e9

    def kern(tab_ref, out_ref):
        d = pl.program_id(1)
        p = jax.lax.broadcasted_iota(jnp.int32, (HW, C), 0)
        ixb = (p * 7919 + d * 104729) % HW
        out_ref[0, 0] = jnp.take_along_axis(tab_ref[0], ixb, axis=0)

    def pallas_gather(t):
        return pl.pallas_call(
            kern,
            grid=(B, D),
            in_specs=[
                pl.BlockSpec((1, HW, C), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, HW, C), lambda b, d: (b, d, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, HW, C), t.dtype),
        )(t)

    try:
        out = pallas_gather(table)
        ref = xla_ref(table)
        err = jnp.abs(out - ref).max()
        print(f"pallas in-kernel taa compiles, max err {err}", flush=True)
        ms = scan_bench(pallas_gather, table, iters=5, reps=3)
        print(f"pallas taa  : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
              flush=True)
    except Exception as e:
        print(f"pallas taa FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()

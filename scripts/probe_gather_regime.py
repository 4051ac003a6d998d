#!/usr/bin/env python
"""Is the XLA TPU row gather row-count-bound or byte-bound?
Same total bytes at different (rows x width) splits."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    key = jax.random.PRNGKey(0)
    M = 16 * 112 * 112                       # table rows
    total = 16 * 112 * 112 * 24              # baseline gathered rows
    for rows, C in ((total, 32), (total // 2, 64), (total * 2, 16),
                    (total, 16), (total, 8)):
        table = jax.random.normal(key, (M, C), jnp.bfloat16)
        idx = jax.random.randint(key, (rows,), 0, M, jnp.int32)
        f = lambda t, ix: jnp.take(t, ix, axis=0)
        ms = scan_bench(f, table, idx, iters=5, reps=3)
        gb = rows * C * 2 * 2 / 1e9
        print(f"rows {rows/1e6:5.1f}M x {C*2:3d}B: {ms:7.2f} ms "
              f"({gb/(ms*1e-3):5.0f} GB/s, {rows/(ms*1e-3)/1e6:6.0f} Mrows/s)",
              flush=True)


if __name__ == "__main__":
    main()

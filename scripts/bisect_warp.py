#!/usr/bin/env python
"""Warp gather variants: one big (B*HW*D)-row gather vs D concat'd gathers."""
import sys
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    B, Sv, D, C = 16, 112, 24, 32
    HW = Sv * Sv
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (B, Sv, Sv, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, HW, D), 0, B * HW)

    def big(f, i):
        flat = f.reshape(B * HW, C)
        return jnp.take(flat, i.reshape(-1), axis=0).reshape(B, HW, D, C)
    print(f"one gather (B,HW,D,C)      : {scan_bench(big, feat, idx):8.2f} ms",
          flush=True)

    def concat(f, i):
        flat = f.reshape(B * HW, C)
        outs = [jnp.take(flat, i[:, :, d].reshape(-1), axis=0)
                for d in range(D)]
        return jnp.concatenate(outs, axis=-1).reshape(B, HW, D * C)
    print(f"D concat gathers (B,HW,D*C): {scan_bench(concat, feat, idx):8.2f} ms",
          flush=True)

    def big_dense(f, i):
        # one gather then explicit repack to (B, HW, D*C)
        flat = f.reshape(B * HW, C)
        o = jnp.take(flat, i.reshape(-1), axis=0).reshape(B, HW, D * C)
        return o
    print(f"one gather reshape dense   : {scan_bench(big_dense, feat, idx):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

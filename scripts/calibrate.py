#!/usr/bin/env python
"""Chip/tunnel calibration with the hardened scan_bench: MXU matmul ceiling,
conv shapes from the net, gather effective bandwidth, HBM copy bandwidth."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    key = jax.random.PRNGKey(0)
    M = K = N = 4096
    a = jax.random.normal(key, (M, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, N), jnp.bfloat16)
    ms = scan_bench(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
        a, b, iters=10, reps=3)
    print(f"matmul 4096^3 bf16     : {ms:7.2f} ms -> "
          f"{2*M*K*N/(ms*1e-3)/1e12:6.1f} TFLOP/s", flush=True)

    def conv_stack(x, w, dil):
        for _ in range(6):
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w, (1, 1), ((dil, dil), (dil, dil)), rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return x

    for (B, H, C, dil, tag) in ((16, 56, 64, 1, "conv6 56x56x64   "),
                                (16, 28, 256, 2, "dconv6 28x28x256 "),
                                (16, 112, 32, 1, "conv6 112x112x32 ")):
        x = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        ms = scan_bench(lambda xx, ww, d=dil: conv_stack(xx, ww, d), x, w,
                        iters=10, reps=3)
        fl = 6 * 2 * B * H * H * 9 * C * C
        print(f"{tag}: {ms:7.2f} ms -> {fl/(ms*1e-3)/1e12:6.1f} TFLOP/s",
              flush=True)

    # gather at the warp's shape: (B*HW, C) table, B*HW*D random rows
    B, HW, C, D = 16, 112 * 112, 32, 24
    table = jax.random.normal(key, (B * HW, C), jnp.bfloat16)
    idx = jax.random.randint(key, (B * HW * D,), 0, B * HW, jnp.int32)

    def gat(t, ix):
        return jnp.take(t, ix, axis=0)

    ms = scan_bench(gat, table, idx, iters=5, reps=3)
    gb = (B * HW * D * C * 2 * 2) / 1e9
    print(f"gather 4.8M x 64B rows : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s eff",
          flush=True)

    big = jax.random.normal(key, (256, 1024, 1024), jnp.bfloat16)  # 512 MiB
    ms = scan_bench(lambda x: x * 1.0001, big, iters=10, reps=3)
    gb = big.size * 2 * 2 / 1e9
    print(f"copy 512MiB (r+w)      : {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Calibrate achievable TFLOP/s on this chip/tunnel with scan_bench:
big matmul (MXU ceiling), resnet-ish conv stack, and HBM copy bandwidth."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench


def main():
    key = jax.random.PRNGKey(0)
    # --- matmul ceiling ---
    for M, K, N in ((4096, 4096, 4096), (8192, 8192, 8192)):
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N), jnp.bfloat16)
        ms = scan_bench(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
                        a, b, iters=10, reps=2)
        tf = 2 * M * K * N / (ms * 1e-3) / 1e12
        print(f"matmul {M}x{K}x{N} bf16: {ms:7.2f} ms -> {tf:6.1f} TFLOP/s",
              flush=True)

    # --- conv stack at the net's shapes ---
    from flax import linen as nn

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x):  # mimic layer3/4 dilated shapes
            for i in range(6):
                x = nn.relu(nn.Conv(256, (3, 3), kernel_dilation=2, padding=2,
                                    use_bias=False, dtype=jnp.bfloat16,
                                    name=f"c{i}")(x))
            return x

    B = 16
    x = jax.random.normal(key, (B, 28, 28, 256), jnp.bfloat16)
    m = ConvStack()
    v = m.init(key, x)
    ms = scan_bench(lambda xx: m.apply(v, xx), x, iters=10, reps=2)
    fl = 6 * 2 * B * 28 * 28 * 9 * 256 * 256
    print(f"dilated conv 28x28x256 x6 (B={B}): {ms:7.2f} ms -> "
          f"{fl/(ms*1e-3)/1e12:6.1f} TFLOP/s", flush=True)

    x2 = jax.random.normal(key, (B, 56, 56, 64), jnp.bfloat16)

    class ConvStack2(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(6):
                x = nn.relu(nn.Conv(64, (3, 3), padding=1, use_bias=False,
                                    dtype=jnp.bfloat16, name=f"c{i}")(x))
            return x

    m2 = ConvStack2()
    v2 = m2.init(key, x2)
    ms = scan_bench(lambda xx: m2.apply(v2, xx), x2, iters=10, reps=2)
    fl = 6 * 2 * B * 56 * 56 * 9 * 64 * 64
    print(f"conv 56x56x64 x6 (B={B}):          {ms:7.2f} ms -> "
          f"{fl/(ms*1e-3)/1e12:6.1f} TFLOP/s", flush=True)

    # --- HBM bandwidth ---
    big = jax.random.normal(key, (512, 1024, 1024), jnp.bfloat16)  # 1 GiB
    ms = scan_bench(lambda x: x + 1.0, big, iters=10, reps=2)
    gb = big.size * 2 * 2 / 1e9
    print(f"copy 1GiB (r+w): {ms:7.2f} ms -> {gb/(ms*1e-3):6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Calibration round 2: roll-based perturbation (a scalar-add perturbation
factors out of linear ops — XLA hoists the loop-invariant matmul), plus
conv-as-matmul comparisons at the net's shapes."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")


def roll_bench(fn, *args, iters=10, reps=3):
    """Like perfutil.scan_bench but perturbs arg0 with a data-dependent roll:
    permutations cannot be factored out of any op."""
    def step(a, carry, k):
        a0 = jnp.roll(a[0], k + carry.astype(jnp.int32) % 2, axis=0)
        out = fn(a0, *a[1:])
        s = sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))
        return carry + s * 1e-30, ()

    @jax.jit
    def run(*a):
        c, _ = jax.lax.scan(lambda carry, k: step(a, carry, k),
                            jnp.float32(0), jnp.arange(iters))
        return c

    jax.block_until_ready(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    key = jax.random.PRNGKey(0)
    M = K = N = 4096
    a = jax.random.normal(key, (M, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, N), jnp.bfloat16)
    ms = roll_bench(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
                    a, b, iters=10, reps=2)
    print(f"matmul 4096^3 bf16 : {ms:7.2f} ms -> {2*M*K*N/(ms*1e-3)/1e12:6.1f} TFLOP/s",
          flush=True)

    # conv 56x56x64 -> as XLA conv vs as matmul over im2col patches
    B, H, W, C = 16, 56, 56, 64
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05

    def conv6(xx, ww):
        for _ in range(6):
            xx = jax.nn.relu(jax.lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return xx

    ms = roll_bench(conv6, x, w, iters=10, reps=2)
    fl = 6 * 2 * B * H * W * 9 * C * C
    print(f"conv6 56x56x64 XLA : {ms:7.2f} ms -> {fl/(ms*1e-3)/1e12:6.1f} TFLOP/s",
          flush=True)

    wm = w.reshape(9 * C, C)

    def conv6_mm(xx, ww):
        for _ in range(6):
            # im2col: 9 shifted views concatenated on channels, then one matmul
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
                    for dx in range(3)]
            patches = jnp.concatenate(cols, axis=-1)          # (B,H,W,9C)
            yy = jnp.einsum("bhwk,kc->bhwc", patches, ww,
                            preferred_element_type=jnp.float32)
            xx = jax.nn.relu(yy).astype(jnp.bfloat16)
        return xx

    ms = roll_bench(conv6_mm, x, wm, iters=10, reps=2)
    print(f"conv6 56x56x64 mm  : {ms:7.2f} ms -> {fl/(ms*1e-3)/1e12:6.1f} TFLOP/s",
          flush=True)

    # dilated 28x28x256 XLA vs matmul
    B2, H2, W2, C2 = 16, 28, 28, 256
    x2 = jax.random.normal(key, (B2, H2, W2, C2), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, C2, C2), jnp.bfloat16) * 0.02

    def dconv6(xx, ww):
        for _ in range(6):
            xx = jax.nn.relu(jax.lax.conv_general_dilated(
                xx, ww, (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return xx

    ms = roll_bench(dconv6, x2, w2, iters=10, reps=2)
    fl2 = 6 * 2 * B2 * H2 * W2 * 9 * C2 * C2
    print(f"dconv6 28x28x256 XLA: {ms:7.2f} ms -> {fl2/(ms*1e-3)/1e12:6.1f} TFLOP/s",
          flush=True)

    wm2 = w2.reshape(9 * C2, C2)

    def dconv6_mm(xx, ww):
        d = 2
        for _ in range(6):
            xp = jnp.pad(xx, ((0, 0), (d, d), (d, d), (0, 0)))
            cols = [xp[:, dy * d:dy * d + H2, dx * d:dx * d + W2, :]
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(cols, axis=-1)
            yy = jnp.einsum("bhwk,kc->bhwc", patches, ww,
                            preferred_element_type=jnp.float32)
            xx = jax.nn.relu(yy).astype(jnp.bfloat16)
        return xx

    ms = roll_bench(dconv6_mm, x2, wm2, iters=10, reps=2)
    print(f"dconv6 28x28x256 mm : {ms:7.2f} ms -> {fl2/(ms*1e-3)/1e12:6.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()

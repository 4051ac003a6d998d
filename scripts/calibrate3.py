#!/usr/bin/env python
"""Distinguish XLA algebraic elision from tunnel result-caching.

sum(A@B) factors into dot(rowsum(A), colsum(B)) (XLA simplification), so a
scan whose carry is sum(out) does no matmul work at all. Use max(|out|)
(non-factorable) and print every rep's time."""
import sys
import time

import jax
import jax.numpy as jnp


def bench_reps(make_run, args, iters, tag):
    run = make_run(iters)
    ts = []
    for r in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    print(f"{tag}: reps " + " ".join(f"{t:8.3f}" for t in ts) + " ms/iter",
          flush=True)
    return ts


def main():
    key = jax.random.PRNGKey(0)
    M = K = N = 4096
    a = jax.random.normal(key, (M, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, N), jnp.bfloat16)

    def make_run(iters):
        def step(A, B, carry, k):
            A2 = A + carry * 1e-20
            out = jnp.dot(A2, B, preferred_element_type=jnp.float32)
            return carry + jnp.max(jnp.abs(out)) * 1e-30, ()

        @jax.jit
        def run(A, B):
            c, _ = jax.lax.scan(lambda c, k: step(A, B, c, k),
                                jnp.float32(0), jnp.arange(iters))
            return c
        return run

    ts = bench_reps(make_run, (a, b), 10, "matmul 4096^3 max|.| carry")
    tf = 2 * M * K * N / (min(ts) * 1e-3) / 1e12
    print(f"  -> best {tf:6.1f} TFLOP/s")

    # conv stack with max-carry
    def make_conv(iters):
        w = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05

        def step(x, carry, k):
            xx = x + carry * 1e-20
            for _ in range(6):
                xx = jax.nn.relu(jax.lax.conv_general_dilated(
                    xx, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return carry + jnp.max(xx) * 1e-30, ()

        @jax.jit
        def run(x):
            c, _ = jax.lax.scan(lambda c, k: step(x, c, k),
                                jnp.float32(0), jnp.arange(iters))
            return c
        return run

    x = jax.random.normal(key, (16, 56, 56, 64), jnp.bfloat16)
    ts = bench_reps(lambda it: make_conv(it), (x,), 10, "conv6 56x56x64 max carry ")
    fl = 6 * 2 * 16 * 56 * 56 * 9 * 64 * 64
    print(f"  -> best {fl/(min(ts)*1e-3)/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()

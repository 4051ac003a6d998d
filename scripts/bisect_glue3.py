#!/usr/bin/env python
"""Isolate the 33ms floor: is it the op, the input shape, or the dispatch?"""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, N, D = 16, 1024, 24
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, D), dt)
    pts128 = jax.random.normal(key, (B, N, 128), dt)
    pts_f32 = pts.astype(jnp.float32)

    print(f"identity+1 on (B,N,24) bf16: "
          f"{timeit(jax.jit(lambda x: x + 1), pts):8.2f} ms")
    print(f"identity+1 on (B,N,24) f32 : "
          f"{timeit(jax.jit(lambda x: x + 1), pts_f32):8.2f} ms")
    print(f"identity+1 on (B,N,128)bf16: "
          f"{timeit(jax.jit(lambda x: x + 1), pts128):8.2f} ms")
    print(f"sum-last on (B,N,24) bf16  : "
          f"{timeit(jax.jit(lambda x: x.sum(-1)), pts):8.2f} ms")
    print(f"softmax on (B,N,128) bf16  : "
          f"{timeit(jax.jit(lambda x: jax.nn.softmax(x, -1)), pts128):8.2f} ms")
    print(f"softmax on (B,N,24) bf16   : "
          f"{timeit(jax.jit(lambda x: jax.nn.softmax(x, -1)), pts):8.2f} ms")
    big = jax.random.normal(key, (B, 224, 224, 32), dt)
    print(f"identity+1 on (B,224,224,32): "
          f"{timeit(jax.jit(lambda x: x + 1), big):8.2f} ms")
    print(f"empty jit () -> scalar      : "
          f"{timeit(jax.jit(lambda: jnp.float32(0) + 1)):8.2f} ms")
    # non-jit dispatch baseline
    f = jax.jit(lambda x: x + 1)
    o = f(pts)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(100):
        o = f(pts)
    jax.block_until_ready(o)
    print(f"100 async dispatches        : {(time.perf_counter()-t0)*1e3:8.2f} ms total")


if __name__ == "__main__":
    main()

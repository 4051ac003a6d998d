#!/usr/bin/env python
"""Bracket the 33ms: 4D (B,N,D,C) ops vs captured-constant closures."""
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
    B, N, D, C = 16, 1024, 24, 32
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, D), dt)
    pts4 = jax.random.normal(key, (B, N, D, C), dt)
    prob = jax.nn.softmax(jax.random.normal(key, (B, N, D)), -1).astype(dt)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    print(f"pts4 identity+1            : {timeit(jax.jit(lambda x: x + 1), pts4):8.2f} ms")
    print(f"pts4 sum axis 2            : {timeit(jax.jit(lambda x: x.sum(2)), pts4):8.2f} ms")
    print(f"pts4 sum axis 3            : {timeit(jax.jit(lambda x: x.sum(3)), pts4):8.2f} ms")
    print(f"pts4 * prob bcast          : "
          f"{timeit(jax.jit(lambda x, p: x * p[..., None]), pts4, prob):8.2f} ms")
    print(f"pts4 * prob bcast + sum2   : "
          f"{timeit(jax.jit(lambda x, p: (x * p[..., None]).sum(2)), pts4, prob):8.2f} ms")
    print(f"einsum bndc,bnd->bnc       : "
          f"{timeit(jax.jit(lambda x, p: jnp.einsum('bndc,bnd->bnc', x, p)), pts4, prob):8.2f} ms")
    # captured-constant softmax (glue2 v1 form) vs arg-passed
    def cap(p):
        pr = jax.nn.softmax(p.astype(jnp.float32), -1)
        return jnp.einsum("bnd,bd->bn", pr, depths)
    print(f"softmax+einsum captured dep: {timeit(jax.jit(cap), pts):8.2f} ms")

    def arg(p, d):
        pr = jax.nn.softmax(p.astype(jnp.float32), -1)
        return jnp.einsum("bnd,bd->bn", pr, d)
    print(f"softmax+einsum arg dep     : {timeit(jax.jit(arg), pts, depths):8.2f} ms")


if __name__ == "__main__":
    main()

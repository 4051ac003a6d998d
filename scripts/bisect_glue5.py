#!/usr/bin/env python
"""Pin the exact trigger of the 33ms op: (B,N,D) x (B,D) combinations."""
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
    key = jax.random.PRNGKey(0)
    prob = jax.nn.softmax(jax.random.normal(key, (B, N, D)), -1)  # f32
    dep_rand = jax.random.uniform(key, (B, D))
    dep_tile = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
    dvec = jnp.linspace(0.1, 2.4, D)

    t = timeit(jax.jit(lambda p, d: p * d[:, None, :]), prob, dep_rand)
    print(f"mul bcast (B,1,D) rand     : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: (p * d[:, None, :]).sum(-1)), prob, dep_rand)
    print(f"mul bcast + sum rand       : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: (p * d[:, None, :]).sum(-1)), prob, dep_tile)
    print(f"mul bcast + sum tile       : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: (p * d[None, None, :]).sum(-1)), prob, dvec)
    print(f"mul bcast (1,1,D) + sum    : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: jnp.einsum("bnd,bd->bn", p, d)), prob, dep_rand)
    print(f"einsum matvec rand         : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: jnp.einsum("bnd,d->bn", p, d)), prob, dvec)
    print(f"einsum matvec shared d     : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: jnp.einsum("bnd,bkd->bnk", p, d[:, None, :])[..., 0]),
               prob, dep_rand)
    print(f"einsum matmul k=1          : {t:8.2f} ms")
    t = timeit(jax.jit(lambda p, d: jnp.einsum("bnd,dk->bnk", p, d[:, None])[..., 0]),
               prob, dvec)
    print(f"matmul shared (D,1)        : {t:8.2f} ms")


if __name__ == "__main__":
    main()

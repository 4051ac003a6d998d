#!/usr/bin/env python
"""Layout fixes: pad D to lane width / move N to minor / split jits."""
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
    pts_t = jnp.moveaxis(pts, -1, 1)  # (B, D, N)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    def padded(p):
        x = p.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 128 - D)), constant_values=-1e30)
        pr = jax.nn.softmax(x, -1)
        dpad = jnp.pad(depths, ((0, 0), (0, 128 - D)))
        return jnp.einsum("bnd,bd->bn", pr, dpad)
    print(f"pad D->128                 : {timeit(jax.jit(padded), pts):8.2f} ms")

    def nminor(p_t):
        x = p_t.astype(jnp.float32)          # (B, D, N)
        m = x.max(1, keepdims=True)
        e = jnp.exp(x - m)
        return (e * depths[:, :, None]).sum(1) / e.sum(1)
    print(f"N minor (B,D,N)            : {timeit(jax.jit(nminor), pts_t):8.2f} ms")

    # two separate jits (forced materialization between)
    f1 = jax.jit(lambda p: jax.nn.softmax(p.astype(jnp.float32), -1))
    f2 = jax.jit(lambda pr: jnp.einsum("bnd,bd->bn", pr, depths))
    pr = jax.block_until_ready(f1(pts))
    print(f"softmax jit alone          : {timeit(f1, pts):8.2f} ms")
    print(f"einsum jit alone           : {timeit(f2, pr):8.2f} ms")

    # exp alone, max alone, exp+sum in one jit
    print(f"exp alone                  : "
          f"{timeit(jax.jit(lambda p: jnp.exp(p.astype(jnp.float32))), pts):8.2f} ms")
    print(f"max+exp+div (softmax expand): "
          f"{timeit(jax.jit(lambda p: (lambda x: jnp.exp(x - x.max(-1, keepdims=True)) / jnp.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True))(p.astype(jnp.float32))), pts):8.2f} ms")


if __name__ == "__main__":
    main()

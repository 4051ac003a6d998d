#!/usr/bin/env python
"""Candidate fixes for the pathological softmax+consumer fusion."""
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
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    def slow(p):
        pr = jax.nn.softmax(p.astype(jnp.float32), -1)
        return jnp.einsum("bnd,bd->bn", pr, depths)
    print(f"baseline slow              : {timeit(jax.jit(slow), pts):8.2f} ms")

    def barrier(p):
        pr = jax.nn.softmax(p.astype(jnp.float32), -1)
        pr = jax.lax.optimization_barrier(pr)
        return jnp.einsum("bnd,bd->bn", pr, depths)
    print(f"optimization_barrier       : {timeit(jax.jit(barrier), pts):8.2f} ms")

    def manual(p):
        # hand-rolled softmax-expectation without jax.nn.softmax
        x = p.astype(jnp.float32)
        m = x.max(-1, keepdims=True)
        e = jnp.exp(x - m)
        return (e * depths[:, None, :]).sum(-1) / e.sum(-1)
    print(f"manual expectation         : {timeit(jax.jit(manual), pts):8.2f} ms")

    def full_combo(p, x4):
        pr = jax.nn.softmax(p.astype(jnp.float32), -1)
        pr = jax.lax.optimization_barrier(pr)
        depth = jnp.einsum("bnd,bd->bn", pr, depths)
        feat = jnp.einsum("bndc,bnd->bnc", x4, pr.astype(x4.dtype))
        return depth, feat
    print(f"combo with barrier         : {timeit(jax.jit(full_combo), pts, pts4):8.2f} ms")

    def combo_manual(p, x4):
        x = p.astype(jnp.float32)
        m = x.max(-1, keepdims=True)
        e = jnp.exp(x - m)
        s = e.sum(-1)
        depth = (e * depths[:, None, :]).sum(-1) / s
        feat = jnp.einsum("bndc,bnd->bnc", x4, (e / s[..., None]).astype(x4.dtype))
        return depth, feat
    print(f"combo manual               : {timeit(jax.jit(combo_manual), pts, pts4):8.2f} ms")


if __name__ == "__main__":
    main()

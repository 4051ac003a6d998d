#!/usr/bin/env python
"""Variants of the two pathological ops: softmax-depth and weighted volume sum."""
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
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
    pts4 = jax.random.normal(key, (B, N, D, C), dt)
    prob_f32 = jax.nn.softmax(jax.random.normal(key, (B, N, D)), -1)
    prob_bf = prob_f32.astype(dt)

    def v0(p):  # current
        prob = jax.nn.softmax(p.astype(jnp.float32), axis=-1)
        return (prob * depths[:, None, :]).sum(-1)
    print(f"softmax v0 (f32 bcast-sum) : {timeit(jax.jit(v0), pts):8.2f} ms")

    def v1(p):
        prob = jax.nn.softmax(p.astype(jnp.float32), axis=-1)
        return jnp.einsum("bnd,bd->bn", prob, depths)
    print(f"softmax v1 (einsum)        : {timeit(jax.jit(v1), pts):8.2f} ms")

    def v2(p):
        prob = jax.nn.softmax(p, axis=-1)  # bf16 softmax
        return jnp.einsum("bnd,bd->bn", prob, depths.astype(dt))
    print(f"softmax v2 (bf16 einsum)   : {timeit(jax.jit(v2), pts):8.2f} ms")

    def v3(p):
        # move D to a 2D-friendly position: reshape (B*N, D)
        p2 = p.reshape(B * N, D).astype(jnp.float32)
        prob = jax.nn.softmax(p2, axis=-1)
        d2 = jnp.repeat(depths, N, axis=0)
        return (prob * d2).sum(-1).reshape(B, N)
    print(f"softmax v3 (flat 2D)       : {timeit(jax.jit(v3), pts):8.2f} ms")

    def w0(x, pr):  # current
        return (x * pr[..., None].astype(x.dtype)).sum(2)
    print(f"wsum v0 (bcast-sum, f32 pr): {timeit(jax.jit(w0), pts4, prob_f32):8.2f} ms")

    def w1(x, pr):
        return jnp.einsum("bndc,bnd->bnc", x, pr.astype(x.dtype))
    print(f"wsum v1 (einsum bf16)      : {timeit(jax.jit(w1), pts4, prob_bf):8.2f} ms")

    def w2(x, pr):
        x2 = x.reshape(B * N, D, C)
        p2 = pr.reshape(B * N, 1, D).astype(x.dtype)
        return jnp.matmul(p2, x2).reshape(B, N, C)
    print(f"wsum v2 (batched matmul)   : {timeit(jax.jit(w2), pts4, prob_bf):8.2f} ms")

    # combined: softmax+einsum fused as in the net (prob consumed twice)
    def combo(p, x):
        prob = jax.nn.softmax(p.astype(jnp.float32), axis=-1)
        depth = jnp.einsum("bnd,bd->bn", prob, depths)
        feat = jnp.einsum("bndc,bnd->bnc", x, prob.astype(x.dtype))
        return depth, feat
    print(f"combo (einsum both)        : {timeit(jax.jit(combo), pts, pts4):8.2f} ms")


if __name__ == "__main__":
    main()

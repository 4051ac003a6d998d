#!/usr/bin/env python
"""Micro-bench the glue ops of StereoPoseNetWithDepth at production shapes."""
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
    from rgbmanip_tpu.ops.gather import flat_gather, point_sample_matmul

    B, S, Sv, D, N, C = 16, 224, 112, 24, 1024, 32
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (B, S, S, C), dt)
    featv = jax.random.normal(key, (B, Sv, Sv, D), dt)
    fused = jax.random.normal(key, (B, D, Sv, Sv, C), dt)
    choose = jax.random.randint(key, (B, N), 0, S * S)
    py = (choose // S).astype(jnp.float32)
    px = (choose % S).astype(jnp.float32)

    t = timeit(jax.jit(lambda f, y, x: point_sample_matmul(f, y, x)), feat, py, px)
    print(f"point_sample_matmul 224x32 : {t:8.2f} ms")

    t = timeit(jax.jit(lambda f, y, x: point_sample_matmul(f, y / 2, x / 2)),
               featv, py, px)
    print(f"point_sample_matmul 112xD  : {t:8.2f} ms")

    t = timeit(jax.jit(lambda f, c: flat_gather(f.reshape(B, S * S, C), c)),
               feat, choose)
    print(f"flat_gather N=1024 224x32  : {t:8.2f} ms")

    d_offs = (jnp.arange(D, dtype=jnp.int32) * (Sv * Sv))[None, None, :]
    idx = ((choose // S // 2) * Sv + (choose % S) // 2)[..., None] + d_offs

    t = timeit(jax.jit(lambda f, i: flat_gather(f.reshape(B, D * Sv * Sv, C), i)),
               fused, idx)
    print(f"flat_gather N*D pose_branch: {t:8.2f} ms")

    # one-hot full-pixel matmul alternative for integer gathers
    def onehot_sample(f, c):
        oh = jax.nn.one_hot(c, S * S, dtype=dt)            # (B, N, S*S)
        return jnp.einsum("bnp,bpc->bnc", oh, f.reshape(B, S * S, C))
    t = timeit(jax.jit(onehot_sample), feat, choose)
    print(f"one-hot full matmul 224x32 : {t:8.2f} ms")

    # softmax depth regression
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
    pts = jax.random.normal(key, (B, N, D), dt)

    def pd(p):
        prob = jax.nn.softmax(p.astype(jnp.float32), axis=-1)
        return (prob * depths[:, None, :]).sum(-1)
    print(f"softmax depth              : {timeit(jax.jit(pd), pts):8.2f} ms")

    # weighted volume-feature reduction in pose_branch
    prob = jax.nn.softmax(jax.random.normal(key, (B, N, D)), -1)

    def wsum(pts4, pr):
        return (pts4 * pr[..., None].astype(pts4.dtype)).sum(2)
    pts4 = jax.random.normal(key, (B, N, D, C), dt)
    print(f"prob-weighted sum          : {timeit(jax.jit(wsum), pts4, prob):8.2f} ms")


if __name__ == "__main__":
    main()

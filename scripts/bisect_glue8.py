#!/usr/bin/env python
"""Minimal pairs for the 30ms pathology + HLO dump of slow vs fast."""
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
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    a = jax.jit(lambda p: jax.nn.softmax(p, -1))
    print(f"a softmax bf16             : {timeit(a, pts):8.2f} ms")

    b = jax.jit(lambda p: jax.nn.softmax(p.astype(jnp.float32), -1))
    print(f"b cast+softmax f32         : {timeit(b, pts):8.2f} ms")

    c = jax.jit(lambda p, d: jnp.einsum(
        "bnd,bd->bn", jax.nn.softmax(p, -1), d.astype(dt)))
    print(f"c softmax+einsum bf16      : {timeit(c, pts, depths):8.2f} ms")

    d_ = jax.jit(lambda p: p.astype(jnp.float32))
    print(f"d cast only                : {timeit(d_, pts):8.2f} ms")

    e = jax.jit(lambda p: jnp.exp(p))
    print(f"e exp bf16                 : {timeit(e, pts):8.2f} ms")

    f = jax.jit(lambda p: jnp.exp(p.astype(jnp.float32)))
    print(f"f cast+exp                 : {timeit(f, pts):8.2f} ms")

    g = jax.jit(lambda p: jnp.exp(p).astype(jnp.float32))
    print(f"g exp then cast            : {timeit(g, pts):8.2f} ms")

    # HLO of the slow one (b) and fast one (a)
    for tag, fn in (("fast_a", a), ("slow_b", b)):
        txt = fn.lower(pts).compile().as_text()
        path = f"/tmp/hlo_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()

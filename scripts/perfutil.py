"""Benchmark helper that defeats result-caching and dispatch artifacts.

``scan_bench(fn, *args)`` wraps fn in a lax.scan over K iterations, feeding a
slightly perturbed input each step (so no (program, input) result cache can
serve it) and carrying a data dependency between steps (so iterations cannot
be elided or overlapped). Returns ms per iteration of steady-state device
time. Measurements through the axon tunnel showed per-call timings of
repeated identical executions can be served ~1000x faster than real device
time; this is the trustworthy form.
"""

import time

import jax
import jax.numpy as jnp


def scan_bench(fn, *args, iters: int = 10, reps: int = 3):
    """fn(*args) -> pytree. First arg must be a float array; it is perturbed
    per scan step with a tiny data-dependent offset."""

    def step(carry, k):
        a0 = args[0] + (carry * 1e-12 + k.astype(args[0].dtype) * 0)
        out = fn(a0, *args[1:])
        leaves = jax.tree.leaves(out)
        s = sum(x.astype(jnp.float32).sum() for x in leaves)
        return carry + s * 1e-30, ()

    ks = jnp.arange(iters)

    @jax.jit
    def run():
        c, _ = jax.lax.scan(step, jnp.float32(0), ks)
        return c

    jax.block_until_ready(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best

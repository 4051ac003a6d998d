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
    per scan step with a tiny data-dependent offset.

    args are passed through jit as real arguments (NOT closure captures):
    captured arrays become HLO constants, which blows up the compile payload
    and would let XLA constant-fold input-dependent subgraphs."""

    def step(a, carry, k):
        a0 = a[0] + (carry * 1e-12 + k.astype(a[0].dtype) * 0)
        out = fn(a0, *a[1:])
        leaves = jax.tree.leaves(out)
        s = sum(x.astype(jnp.float32).sum() for x in leaves)
        return carry + s * 1e-30, ()

    @jax.jit
    def run(*a):
        c, _ = jax.lax.scan(lambda carry, k: step(a, carry, k),
                            jnp.float32(0), jnp.arange(iters))
        return c

    jax.block_until_ready(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best

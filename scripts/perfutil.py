"""Benchmark helper that defeats result-caching, dispatch artifacts, and
XLA elision. Defenses, all required (each was observed to corrupt timings
through the axon TPU tunnel):

1. The tunnel memoizes executions: repeated identical calls return without
   touching the device (measured 0.01 ms/iter reps after a 130 ms first rep
   on a 4096^3 matmul; a distinct tiny scalar arg did NOT bust the cache).
   -> every rep perturbs the FIRST (large) argument on the host, so the
   device sees genuinely different input content each call.
2. XLA hoists loop-invariant work out of lax.scan, and factors reductions
   through linear ops (sum(A@B) == rowsum(A) @ colsum(B)) — a
   sum-of-output carry elides a matmul entirely. -> the carry perturbs the
   first argument (chains iterations) and reduces via max(|out|), which
   does not factor through linear ops.
3. Per-call dispatch overhead through the tunnel is large relative to small
   kernels. -> iterations run inside one scan executable.
4. Closure-captured arrays become HLO constants (huge compile payloads,
   constant-foldable) -> all array args are jit parameters.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def scan_bench(fn, *args, iters: int = 10, reps: int = 3):
    """Return best steady-state ms per call of fn(*args).
    fn's first argument must be a float array."""

    def step(a, carry, k):
        eps = (carry * 1e-20 + k.astype(jnp.float32) * 0.0)
        a0 = a[0] + eps.astype(a[0].dtype)
        out = fn(a0, *a[1:])
        s = sum(jnp.max(jnp.abs(x.astype(jnp.float32)))
                for x in jax.tree.leaves(out))
        return carry + s * 1e-30, ()

    @jax.jit
    def run(*a):
        c, _ = jax.lax.scan(lambda carry, k: step(a, carry, k),
                            jnp.float32(0), jnp.arange(iters))
        return c

    rest = args[1:]
    a0_host = np.asarray(args[0])
    scale = float(np.abs(a0_host).max()) or 1.0

    def variant(r):
        # host-side perturbation: distinct device buffer content per rep
        x = jnp.asarray(a0_host + (r * 1e-6 * scale), dtype=args[0].dtype)
        return jax.block_until_ready(x)

    jax.block_until_ready(run(variant(7), *rest))  # compile
    best = float("inf")
    for r in range(reps):
        v = variant(r + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(run(v, *rest))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best

#!/usr/bin/env python
"""Full-net forward with min-statistics (contention-robust) at B=16/32."""
import time, os
import jax
import jax.numpy as jnp

def timed_min(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, sorted(ts)[len(ts)//2] * 1e3

def main():
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
    D, S, N = 24, 224, 1024
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for B in (16, 32):
        img = jax.random.normal(key, (B, S, S, 3), dt)
        choose = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1))
        proj = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
        proj2 = proj.at[:, 0, 3].set(0.1)
        depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
        net = StereoPoseNetWithDepth(backend="resnet34", volume_scale=2,
                                     warp_mode="nearest", dtype=dt)
        v = net.init(key, img, choose, img, choose, proj, proj2, depths, False)
        f = jax.jit(lambda v: net.apply(v, img, choose, img, choose, proj, proj2,
                                        depths, False))
        mn, med = timed_min(f, v)
        print(f"B={B}: min {mn:7.2f} ms ({2*B/mn*1e3:6.0f} fps)  "
              f"median {med:7.2f} ms ({2*B/med*1e3:6.0f} fps)")

if __name__ == "__main__":
    main()

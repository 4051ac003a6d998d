#!/usr/bin/env python
"""Honest B-scaling of the full net (scan-based, cache-proof)."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench

def main():
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
    S, D, N = 224, 24, 1024
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for B in (16, 32, 64, 128):
        try:
            img = jax.random.normal(key, (B, S, S, 3), dt)
            choose = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1))
            proj = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
            proj2 = proj.at[:, 0, 3].set(0.1)
            depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
            net = StereoPoseNetWithDepth(backend="resnet34", volume_scale=2,
                                         warp_mode="nearest", dtype=dt)
            v = net.init(key, img, choose, img, choose, proj, proj2, depths, False)
            fn = lambda im, v: net.apply(v, im, choose, im, choose, proj, proj2,
                                         depths, False)
            ms = scan_bench(fn, img, v, iters=8, reps=2)
            print(f"B={B:4d}: {ms:8.2f} ms/iter -> {2*B/ms*1e3:7.0f} fps", flush=True)
        except Exception as e:
            print(f"B={B}: failed {type(e).__name__}", flush=True)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bisect the full-net forward cost: time variants with pieces disabled."""
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
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth

    B, S, D, N = 16, 224, 24, 1024
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, S, S, 3), dt)
    choose = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1))
    proj = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    proj2 = proj.at[:, 0, 3].set(0.1)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    def bench(tag, **kw):
        net = StereoPoseNetWithDepth(backend="resnet34", volume_scale=2,
                                     warp_mode="nearest", dtype=dt, **kw)
        v = net.init(key, img, choose, img, choose, proj, proj2, depths, False)
        f = jax.jit(lambda v: net.apply(v, img, choose, img, choose, proj,
                                        proj2, depths, False))
        ms = timeit(f, v)
        print(f"{tag:28s}: {ms:8.2f} ms  ({2 * B / ms * 1e3:6.0f} fps)")

    bench("full (regress_pose)")
    bench("no pose heads", regress_pose=False)
    bench("no fusion + no pose", regress_pose=False, stereo_fusion=False)
    bench("no fusion + pose", regress_pose=True, stereo_fusion=False)


if __name__ == "__main__":
    main()

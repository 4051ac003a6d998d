#!/usr/bin/env python
"""Per-stage timing of the AdaPose estimate path on the current backend.

Times each jitted sub-stage separately (compile excluded) so optimization
targets the real bottleneck rather than the README's stale numbers.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import (
        CostRegNet, StereoPoseNetWithDepth, homo_warp_batched)
    from rgbmanip_tpu.ops.preprocess import prepare_model_input

    B = int(__import__("os").environ.get("B", "16"))
    S = 224
    D = 24
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.devices()[0].platform} B={B}")

    # --- PSPNet ---
    psp = PSPNet(backend="resnet34", dtype=dt)
    img = jax.random.normal(key, (B, S, S, 3), dt)
    vars_ = psp.init(key, img, False)
    f = jax.jit(lambda v, x: psp.apply(v, x, False))
    print(f"PSPNet fwd (B={B},224): {timeit(f, vars_, img):8.2f} ms")

    # --- homography warp, volume_scale=2 nearest and bilinear ---
    Sv = S // 2
    feat = jax.random.normal(key, (B, Sv, Sv, 32), dt)
    proj1 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    proj2 = proj1.at[:, 0, 3].set(0.1)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))
    for mode in ("nearest", "bilinear"):
        w = jax.jit(lambda s, p1, p2, d, m=mode: homo_warp_batched(s, p1, p2, d, m))
        print(f"warp {mode} (B={B},{Sv}): {timeit(w, feat, proj1, proj2, depths):8.2f} ms")

    # --- CostRegNet on (B, D, Sv, Sv, 32) ---
    reg = CostRegNet(base=8, dtype=dt)
    vol = jax.random.normal(key, (B, D, Sv, Sv, 32), dt)
    rv = reg.init(key, vol, False)
    g = jax.jit(lambda v, x: reg.apply(v, x, False))
    print(f"CostRegNet (B={B},D={D},{Sv}): {timeit(g, rv, vol):8.2f} ms")

    # --- fused preprocessing ---
    H, W = 480, 640
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    mask = np.zeros((B, H, W), bool)
    mask[:, 180:300, 280:400] = True
    mask = jnp.asarray(mask)
    K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240], [0, 0, 1.0]],
                                     np.float32), (B, 1, 1)))
    pp = jax.jit(lambda r, m, k, ky: prepare_model_input(r, m, k, ky, 224, 1024))
    print(f"preprocess (B={B},640x480): {timeit(pp, rgb, mask, K, key):8.2f} ms")

    # --- full network fwd ---
    net = StereoPoseNetWithDepth(backend="resnet34", volume_scale=2,
                                 warp_mode="nearest", dtype=dt)
    choose = jnp.tile(jnp.arange(1024, dtype=jnp.int32)[None], (B, 1))
    img224 = jax.random.normal(key, (B, S, S, 3), dt)
    p4 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    nv = net.init(key, img224, choose, img224, choose, p4, p4, depths, False)
    nf = jax.jit(lambda v: net.apply(v, img224, choose, img224, choose, p4,
                                     p4, depths, False))
    ms = timeit(nf, nv)
    print(f"full net fwd (B={B}): {ms:8.2f} ms -> {2 * B / ms * 1e3:.0f} fps")


if __name__ == "__main__":
    main()

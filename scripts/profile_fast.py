#!/usr/bin/env python
"""Component timing at the EXACT fast-config shapes (192px, r18 stride-32,
24^2 x 16 volume, B=64): backbone, warp, cost reg, preprocessing, solve."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
which = sys.argv[2] if len(sys.argv) > 2 else "all"
S, Sv, D, C = 192, 24, 16, 32
dt = jnp.bfloat16
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

if which in ("all", "psp"):
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
    psp = PSPNet(backend="resnet18", backbone_stride=32, dtype=dt)
    img = jnp.asarray(rng.uniform(size=(B, S, S, 3)).astype(np.float32)).astype(dt)
    pvars = psp.init(key, img)
    ms = scan_bench(lambda x: psp.apply(pvars, x), img, iters=8, reps=2)
    print(f"PSPNet r18-s32 1 view : {ms:8.2f} ms", flush=True)

if which in ("all", "warp"):
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import homo_warp_batched
    feat = jnp.asarray(rng.uniform(size=(B, Sv, Sv, C)).astype(np.float32)).astype(dt)
    K = np.tile(np.array([[54.9, 0, Sv / 2], [0, 54.9, Sv / 2], [0, 0, 1.0]],
                         np.float32), (B, 1, 1))
    P4 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)); P4[:, :3, :3] = K
    p1 = jnp.asarray(P4)
    P4b = P4.copy(); P4b[:, 0, 3] = 5.0
    p2 = jnp.asarray(P4b)
    depths = jnp.asarray(np.tile(np.linspace(0.1, 2.4, D, dtype=np.float32), (B, 1)))
    ms = scan_bench(lambda f, a, b, d: homo_warp_batched(f, a, b, d, "nearest", "hwd"),
                    feat, p2, p1, depths, iters=8, reps=2)
    print(f"warp nearest 1 view   : {ms:8.2f} ms", flush=True)

if which in ("all", "reg"):
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import CostRegNet2D
    vol = jnp.asarray(rng.uniform(size=(B, Sv, Sv, D * C)).astype(np.float32)).astype(dt)
    reg = CostRegNet2D(base=8, dtype=dt)
    rvars = reg.init(key, vol, D)
    ms = scan_bench(lambda v: reg.apply(rvars, v, D), vol, iters=8, reps=2)
    print(f"CostRegNet2D 1 view   : {ms:8.2f} ms", flush=True)

if which in ("all", "prep"):
    from rgbmanip_tpu.ops.preprocess import prepare_model_input
    H, W, N = 480, 640, 1024
    rgb = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    mask = np.zeros((B, H, W), bool); mask[:, 180:300, 280:400] = True
    mask = jnp.asarray(mask)
    K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240],
                                      [0, 0, 1.0]], np.float32), (B, 1, 1)))
    k2 = jax.random.PRNGKey(1)
    ms = scan_bench(lambda r, m, k_: prepare_model_input(r, m, k_, S, N, k2),
                    rgb, mask, K, iters=8, reps=2)
    print(f"preprocess 1 view     : {ms:8.2f} ms", flush=True)

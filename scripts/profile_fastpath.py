#!/usr/bin/env python
"""Component breakdown of the FAST bench config (192px/r18-s32/vs8/D16/nearest)
at the bench batch size: full _estimate, preprocessing, network forward, and
isolated warp/costreg at the same shapes. Chip may be contended — treat
ratios, not absolutes."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
from rgbmanip_tpu.models.pose_estimator.nets.stereo import (
    CostRegNet2D, homo_warp_batched)
from rgbmanip_tpu.ops.preprocess import prepare_model_input
from rgbmanip_tpu.utils.logger import get_logger

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
dt = jnp.bfloat16
log = get_logger(); log.setLevel("WARNING")
cfg = {"name": "adapose_v5", "task_name": "one_door_cabinet", "load": False,
       "checkpoint_path": "", "img_size": 192, "use_depth": True,
       "n_pts": 1024, "direct_regression": True, "real_world": False,
       "backend": "resnet18", "backbone_stride": 32,
       "volume_scale": 8, "n_depth": 16, "d_interval": 0.15,
       "warp_mode": "nearest"}
est = AdaPoseEstimator(cfg, log, dtype=dt)
H, W, S = 480, 640, 192
key = jax.random.PRNGKey(0)
rgb1, rgb2 = jax.jit(lambda k: tuple(
    jax.random.uniform(kk, (B, H, W, 3)) for kk in jax.random.split(k)))(key)
jax.block_until_ready((rgb1, rgb2))
mask = np.zeros((B, H, W), bool); mask[:, 180:300, 280:400] = True
maskd = jnp.asarray(mask)
K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240],
                                  [0, 0, 1.0]], np.float32), (B, 1, 1)))
ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)); ext[:, 2, 3] = 1.0
ext2 = ext.copy(); ext2[:, 0, 3] = 0.1
e1d, e2d = jnp.asarray(ext), jnp.asarray(ext2)

def prep2(r1, r2, m, k_):
    a = prepare_model_input(r1, m, k_, key, S, 1024)
    b = prepare_model_input(r2, m, k_, key, S, 1024)
    return a[0].sum() + b[0].sum()

ms = scan_bench(prep2, rgb1, rgb2, maskd, K, iters=8, reps=3)
print(f"preprocess x2      : {ms:8.2f} ms", flush=True)

# network forward only (from already-prepped 192px crops)
c1 = jax.random.uniform(key, (B, S, S, 3), dt)
choose = jnp.tile(jnp.arange(1024, dtype=jnp.int32)[None], (B, 1))
P = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
P2m = P.at[:, 0, 3].set(40.0)
depths = jnp.tile(jnp.linspace(0.35, 2.6, 16)[None], (B, 1)).astype(jnp.float32)

def fwd(a, b, ch, p1, p2, d):
    out = est.model.apply({"params": est.params, "batch_stats": est.batch_stats},
                          a, ch, b, ch, p1, p2, d, train=False)
    return out["view1_nocs"].sum() + out["view1_depth"].sum()

ms = scan_bench(fwd, c1, c1 + 1, choose, P, P2m, depths, iters=8, reps=3)
print(f"network fwd        : {ms:8.2f} ms", flush=True)

# isolated PSP (r18 s32) x2
psp = PSPNet(backend="resnet18", backbone_stride=32, dtype=dt)
pv = psp.init(key, c1, False)
ms = scan_bench(lambda x: psp.apply(pv, x, False).sum()
                + psp.apply(pv, x + 1, False).sum(), c1, iters=8, reps=3)
print(f"PSP x2 (s32)       : {ms:8.2f} ms", flush=True)

# isolated warp x2 at volume res 24
Sv = 24
feat = jax.random.uniform(key, (B, Sv, Sv, 32), dt)
ms = scan_bench(lambda f: homo_warp_batched(f, P2m, P, depths, "nearest", "hwd").sum()
                + homo_warp_batched(f + 1, P, P2m, depths, "nearest", "hwd").sum(),
                feat, iters=8, reps=3)
print(f"warp nearest x2    : {ms:8.2f} ms", flush=True)

# isolated costreg x2
vol = jax.random.uniform(key, (B, Sv, Sv, 16 * 32), dt)
reg = CostRegNet2D(base=8, dtype=dt)
rv = reg.init(key, vol, 16)
ms = scan_bench(lambda v: reg.apply(rv, v, 16).sum()
                + reg.apply(rv, v + 1, 16).sum(), vol, iters=8, reps=3)
print(f"CostReg x2         : {ms:8.2f} ms", flush=True)

import os
if os.environ.get("PROFILE_FULL") == "1":
    def full(r1, r2, m, k_, a, b):
        bbox, _, _ = est._estimate(est.params, est.batch_stats, k_, r1, m, a,
                                   r2, m, b, key)
        return bbox

    ms = scan_bench(full, rgb1, rgb2, maskd, K, e1d, e2d, iters=8, reps=3)
    print(f"full estimate B={B}: {ms:8.2f} ms -> {2*B/ms*1e3:6.0f} fps", flush=True)

#!/usr/bin/env python
"""Knob sweep of the REAL jitted estimate path with scan_bench: config deltas
localize where the time goes (backbone / volume depth / volume res / reg)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

BASE = {"name": "adapose_v5", "task_name": "one_door_cabinet", "load": False,
        "checkpoint_path": "", "img_size": 224, "use_depth": True,
        "n_pts": 1024, "direct_regression": True, "real_world": False,
        "volume_scale": 2, "warp_mode": "nearest"}


def run_cfg(cfg, B, tag):
    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
    from rgbmanip_tpu.utils.logger import get_logger
    log = get_logger(); log.setLevel("WARNING")
    H, W = 480, 640
    rng = np.random.default_rng(0)
    try:
        est = AdaPoseEstimator(cfg, log, dtype=jnp.bfloat16)
        rgb1 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
        rgb2 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
        mask = np.zeros((B, H, W), bool)
        mask[:, 180:300, 280:400] = True
        mask = jnp.asarray(mask)
        K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240],
                                          [0, 0, 1.0]], np.float32), (B, 1, 1)))
        ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        ext[:, 2, 3] = 1.0
        ext2 = ext.copy(); ext2[:, 0, 3] = 0.1
        ext, ext2 = jnp.asarray(ext), jnp.asarray(ext2)
        key = jax.random.PRNGKey(0)

        def f(r1, r2, m, k_, e1, e2):
            bbox, _ = est._estimate(est.params, est.batch_stats, k_, r1, m,
                                    e1, r2, m, e2, key)
            return bbox
        ms = scan_bench(f, rgb1, rgb2, mask, K, ext, ext2, iters=8, reps=2)
        print(f"{tag:34s} B={B:3d}: {ms:8.2f} ms -> {2*B/ms*1e3:7.0f} fps",
              flush=True)
    except Exception as e:
        print(f"{tag:34s} B={B:3d}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jobs = {
        "parity16": (dict(BASE), 16, "parity"),
        "parity32": (dict(BASE), 32, "parity"),
        "parity64": (dict(BASE), 64, "parity"),
        "r18": (dict(BASE, backend="resnet18"), 16, "backbone resnet18"),
        "d12": (dict(BASE, n_depth=12, d_interval=0.2), 16, "n_depth 12"),
        "vs4": (dict(BASE, volume_scale=4), 16, "volume_scale 4"),
        "reg3d": (dict(BASE, reg_impl="unet3d"), 16, "reg_impl unet3d"),
        "bilin": (dict(BASE, warp_mode="bilinear"), 16, "warp bilinear"),
        # fast-architecture candidates (strided backbone, coarser volume).
        # Constraint chain: volume_scale % (backbone_stride/8) == 0, the cost
        # U-Net needs Sv = img_size/volume_scale divisible by 8, n_depth % 8
        # == 0 -> img_size 192 with vs=8 gives Sv=24.
        "fast192": (dict(BASE, img_size=192, backend="resnet18",
                         backbone_stride=32, volume_scale=8, n_depth=16,
                         d_interval=0.15), 32, "fast192 r18 bs32 vs8 d16"),
        "fast192b128": (dict(BASE, img_size=192, backend="resnet18",
                             backbone_stride=32, volume_scale=8, n_depth=16,
                             d_interval=0.15), 128, "fast192 r18 bs32 vs8 d16"),
        "fast192b256": (dict(BASE, img_size=192, backend="resnet18",
                             backbone_stride=32, volume_scale=8, n_depth=16,
                             d_interval=0.15), 256, "fast192 r18 bs32 vs8 d16"),
        "fastv4": (dict(BASE, backend="resnet18", backbone_stride=32,
                        volume_scale=4, n_depth=16, d_interval=0.15), 32,
                   "fast r18 bs32 vs4 d16"),
        "fast128px": (dict(BASE, img_size=128, backend="resnet18",
                           backbone_stride=32, volume_scale=4, n_depth=16,
                           d_interval=0.15), 128, "fast128px r18 bs32 vs4 d16"),
    }
    for k, (cfg, B, tag) in jobs.items():
        if which in ("all", k):
            run_cfg(cfg, B, tag)

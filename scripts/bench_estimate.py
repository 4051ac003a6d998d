#!/usr/bin/env python
"""Honest (scan-based) benchmark of the full jitted estimate path —
preprocessing from raw 640x480 + network + pose solve — for the parity and
fast estimator configs."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from perfutil import scan_bench

PARITY = {"name": "adapose_v5", "task_name": "one_door_cabinet", "load": False,
          "checkpoint_path": "", "img_size": 224, "use_depth": True,
          "n_pts": 1024, "direct_regression": True, "real_world": False,
          "volume_scale": 2, "warp_mode": "nearest"}

FAST = dict(PARITY, img_size=112, backend="resnet18", n_depth=16,
            d_interval=0.15, volume_scale=2, volume_channels=8, n_pts=512)


def bench(cfg, tag, Bs=(16, 32, 64)):
    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
    from rgbmanip_tpu.utils.logger import get_logger
    log = get_logger()
    log.setLevel("WARNING")
    H, W = 480, 640
    rng = np.random.default_rng(0)
    est = AdaPoseEstimator(cfg, log, dtype=jnp.bfloat16)
    for B in Bs:
        try:
            rgb1 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
            rgb2 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
            mask = np.zeros((B, H, W), bool)
            mask[:, 180:300, 280:400] = True
            mask = jnp.asarray(mask)
            K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240],
                                              [0, 0, 1.0]], np.float32), (B, 1, 1)))
            ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
            ext[:, 2, 3] = 1.0
            ext2 = ext.copy()
            ext2[:, 0, 3] = 0.1
            ext, ext2 = jnp.asarray(ext), jnp.asarray(ext2)
            key = jax.random.PRNGKey(0)

            def run(r1, r2):
                bbox, valid = est._estimate(est.params, est.batch_stats, K, r1,
                                            mask, ext, r2, mask, ext2, key)
                return bbox
            ms = scan_bench(run, rgb1, rgb2, iters=8, reps=2)
            print(f"{tag} B={B:3d}: {ms:8.2f} ms -> {2*B/ms*1e3:7.0f} fps",
                  flush=True)
        except Exception as e:
            print(f"{tag} B={B}: failed {type(e).__name__}: {e}", flush=True)
            break


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "fast"):
        bench(FAST, "fast  ")
    if which in ("both", "parity"):
        bench(PARITY, "parity", Bs=(16,))

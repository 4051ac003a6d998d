#!/usr/bin/env python
"""Ablation timing of the fast estimate path at B=64: prep only,
prep+forward, full (prep+forward+solve). Differences localize the cost.
All shapes = bench.py's fast config. iters amortize the ~27 ms tunnel RTT."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
from rgbmanip_tpu.ops.preprocess import depth_hypotheses, prepare_model_input
from rgbmanip_tpu.utils.logger import get_logger

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
which = sys.argv[2] if len(sys.argv) > 2 else "all"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
backend = sys.argv[4] if len(sys.argv) > 4 else "resnet18"

log = get_logger(); log.setLevel("WARNING")
cfg = {"name": "adapose_v5", "task_name": "t", "load": False,
       "checkpoint_path": "", "img_size": 192, "use_depth": True,
       "n_pts": 1024, "direct_regression": True, "real_world": False,
       "backend": backend, "backbone_stride": 32,
       "volume_scale": 8, "n_depth": 16, "d_interval": 0.15,
       "warp_mode": "nearest"}
est = AdaPoseEstimator(cfg, log, dtype=jnp.bfloat16)

H, W = 480, 640
rng = np.random.default_rng(0)
rgb1 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
rgb2 = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
mask = np.zeros((B, H, W), bool); mask[:, 180:300, 280:400] = True
mask = jnp.asarray(mask)
K = jnp.asarray(np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240],
                                  [0, 0, 1.0]], np.float32), (B, 1, 1)))
ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)); ext[:, 2, 3] = 1.0
ext2 = ext.copy(); ext2[:, 0, 3] = 0.1
ext, ext2 = jnp.asarray(ext), jnp.asarray(ext2)
key = jax.random.PRNGKey(0)


def prep_only(r1, r2, m):
    k1, k2 = jax.random.split(key)
    a = prepare_model_input(r1, m, K, k1, est.img_size, est.n_pts)
    b = prepare_model_input(r2, m, K, k2, est.img_size, est.n_pts)
    return a[0], b[0]


def prep_forward(r1, r2, m):
    k1, k2 = jax.random.split(key)
    c1, choose1, _, newK1, _ = prepare_model_input(r1, m, K, k1, est.img_size, est.n_pts)
    c2, choose2, _, newK2, _ = prepare_model_input(r2, m, K, k2, est.img_size, est.n_pts)
    def full_proj(nk, e):
        return jnp.eye(4).at[:3, :].set(nk @ e[:3, :])
    P1 = jax.vmap(full_proj)(newK1, ext)
    P2 = jax.vmap(full_proj)(newK2, ext2)
    dv = depth_hypotheses(r1.shape[0], est.d_min, est.d_interval, est.n_depth)
    pred = est._forward(est.params, est.batch_stats,
                        c1.astype(est.model.dtype), choose1,
                        c2.astype(est.model.dtype), choose2, P1, P2, dv)
    return pred["view1_nocs"], pred["view1_depth"]


def prep_forward_r(r1, r2, m):
    # exactly the heads the direct-regression solve consumes
    k1, k2 = jax.random.split(key)
    c1, choose1, _, newK1, _ = prepare_model_input(r1, m, K, k1, est.img_size, est.n_pts)
    c2, choose2, _, newK2, _ = prepare_model_input(r2, m, K, k2, est.img_size, est.n_pts)
    def full_proj(nk, e):
        return jnp.eye(4).at[:3, :].set(nk @ e[:3, :])
    P1 = jax.vmap(full_proj)(newK1, ext)
    P2 = jax.vmap(full_proj)(newK2, ext2)
    dv = depth_hypotheses(r1.shape[0], est.d_min, est.d_interval, est.n_depth)
    pred = est._forward(est.params, est.batch_stats,
                        c1.astype(est.model.dtype), choose1,
                        c2.astype(est.model.dtype), choose2, P1, P2, dv)
    return pred["view1_nocs"], pred["view1_depth"], pred["view1_r"]


def prep_forward_all(r1, r2, m):
    # every head consumed -> nothing the solve needs can be DCE'd
    k1, k2 = jax.random.split(key)
    c1, choose1, _, newK1, _ = prepare_model_input(r1, m, K, k1, est.img_size, est.n_pts)
    c2, choose2, _, newK2, _ = prepare_model_input(r2, m, K, k2, est.img_size, est.n_pts)
    def full_proj(nk, e):
        return jnp.eye(4).at[:3, :].set(nk @ e[:3, :])
    P1 = jax.vmap(full_proj)(newK1, ext)
    P2 = jax.vmap(full_proj)(newK2, ext2)
    dv = depth_hypotheses(r1.shape[0], est.d_min, est.d_interval, est.n_depth)
    pred = est._forward(est.params, est.batch_stats,
                        c1.astype(est.model.dtype), choose1,
                        c2.astype(est.model.dtype), choose2, P1, P2, dv)
    return tuple(pred.values())


def full(r1, r2, m):
    bbox, _ = est._estimate(est.params, est.batch_stats, K, r1, m, ext,
                            r2, m, ext2, key)
    return bbox


jobs = {"prep": prep_only, "fwd": prep_forward, "fwd_r": prep_forward_r,
        "fwd_all": prep_forward_all, "full": full}
for name, fn in jobs.items():
    if which not in ("all", name):
        continue
    ms = scan_bench(fn, rgb1, rgb2, mask, iters=ITERS, reps=2)
    print(f"{name:5s} B={B} iters={ITERS}: {ms:8.2f} ms  "
          f"({2 * B / ms * 1e3:7.0f} fps)", flush=True)

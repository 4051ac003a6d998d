#!/usr/bin/env python
"""Component-level timing of the estimate path at the production config:
PSPNet backbone, homography warp, CostRegNet, pose heads — each benched as
its own scan_bench program at the same shapes the full path uses. Sums won't
exactly match the fused end-to-end time (XLA fuses across components), but
the ranking tells us where the next factor lives."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
from rgbmanip_tpu.models.pose_estimator.nets.stereo import (
    CostRegNet2D, homo_warp_batched)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
S = int(sys.argv[2]) if len(sys.argv) > 2 else 224
D = int(sys.argv[3]) if len(sys.argv) > 3 else 24
VS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
backend = sys.argv[5] if len(sys.argv) > 5 else "resnet34"
dt = jnp.bfloat16
Sv = S // VS
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

print(f"B={B} S={S} D={D} vs={VS} {backend} bf16", flush=True)

# --- backbone ---
psp = PSPNet(backend=backend, dtype=dt)
img = jnp.asarray(rng.uniform(size=(B, S, S, 3)).astype(np.float32))
pvars = psp.init(key, img)


def run_psp(x):
    return psp.apply(pvars, x)


ms = scan_bench(run_psp, img, iters=8, reps=2)
print(f"PSPNet 1 view       : {ms:8.2f} ms  ({ms / B * 1e3:7.1f} us/frame)",
      flush=True)

# --- warp (nearest, hwd layout) at volume res ---
feat = jnp.asarray(rng.uniform(size=(B, Sv, Sv, 32)).astype(np.float32)).astype(dt)
K = np.tile(np.array([[439.3, 0, Sv / 2], [0, 439.3, Sv / 2], [0, 0, 1.0]],
                     np.float32), (B, 1, 1))
P4 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
P4[:, :3, :3] = K
p1 = jnp.asarray(P4)
P4b = P4.copy()
P4b[:, 0, 3] = 40.0
p2 = jnp.asarray(P4b)
depths = jnp.asarray(np.tile(np.linspace(0.1, 2.4, D, dtype=np.float32),
                             (B, 1)))


def run_warp(f, a, b, d):
    return homo_warp_batched(f, a, b, d, "nearest", "hwd")


ms = scan_bench(run_warp, feat, p2, p1, depths, iters=8, reps=2)
print(f"warp nearest 1 view : {ms:8.2f} ms  ({ms / B * 1e3:7.1f} us/frame)",
      flush=True)

# --- cost regularization (banded 2d) ---
vol = jnp.asarray(rng.uniform(size=(B, Sv, Sv, D * 32)).astype(np.float32)).astype(dt)
reg = CostRegNet2D(base=8, dtype=dt)
rvars = reg.init(key, vol, D)


def run_reg(v):
    return reg.apply(rvars, v, D)


ms = scan_bench(run_reg, vol, iters=8, reps=2)
print(f"CostRegNet 1 view   : {ms:8.2f} ms  ({ms / B * 1e3:7.1f} us/frame)",
      flush=True)

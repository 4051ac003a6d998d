#!/usr/bin/env python
"""Re-anchor the key numbers with the hardened harness (host-perturbed
reps): PSPNet x2, full parity estimate, warp gather isolated."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench


def main():
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import homo_warp_batched
    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
    from rgbmanip_tpu.utils.logger import get_logger

    key = jax.random.PRNGKey(0)
    B, S = 16, 224
    dt = jnp.bfloat16

    # PSP x2
    psp = PSPNet(backend="resnet34", dtype=dt)
    img = jax.random.normal(key, (B, S, S, 3), dt)
    pv = psp.init(key, img, False)

    def psp2(im):
        return psp.apply(pv, im, False).sum() + psp.apply(pv, im + 1, False).sum()

    ms = scan_bench(psp2, img, iters=8, reps=3)
    print(f"PSP x2 (B={B})      : {ms:8.2f} ms", flush=True)

    # warp nearest x2 at vs=2
    Sv = S // 2
    feat = jax.random.normal(key, (B, Sv, Sv, 32), dt)
    proj = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    proj2 = proj.at[:, 0, 3].set(0.1).at[:, 2, 3].set(0.9)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, 24)[None], (B, 1))

    def warp2(f):
        a = homo_warp_batched(f, proj2, proj, depths, "nearest", "hwd")
        b = homo_warp_batched(f + 1, proj, proj2, depths, "nearest", "hwd")
        return a.sum() + b.sum()

    ms = scan_bench(warp2, feat, iters=8, reps=3)
    print(f"warp nearest x2     : {ms:8.2f} ms", flush=True)

    # full parity estimate
    log = get_logger(); log.setLevel("WARNING")
    cfg = {"name": "adapose_v5", "task_name": "one_door_cabinet", "load": False,
           "checkpoint_path": "", "img_size": 224, "use_depth": True,
           "n_pts": 1024, "direct_regression": True, "real_world": False,
           "volume_scale": 2, "warp_mode": "nearest"}
    est = AdaPoseEstimator(cfg, log, dtype=dt)
    H, W = 480, 640
    rng = np.random.default_rng(0)
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
    k = jax.random.PRNGKey(0)

    def f(r1, r2, m, kk, e1, e2):
        bbox, _ = est._estimate(est.params, est.batch_stats, kk, r1, m, e1,
                                r2, m, e2, k)
        return bbox

    ms = scan_bench(f, rgb1, rgb2, mask, K, ext, ext2, iters=8, reps=3)
    print(f"parity estimate B=16: {ms:8.2f} ms -> {2*B/ms*1e3:6.0f} fps",
          flush=True)


if __name__ == "__main__":
    main()

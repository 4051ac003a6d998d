#!/usr/bin/env python
"""Headline benchmark: AdaPose pose-estimation throughput on one chip.

Measures the full jitted estimate path — fused preprocessing from raw
640x480 RGB+mask, StereoPoseNet(with-depth, bf16, TPU-fast architecture
knobs) forward over the plane-sweep depth hypotheses, and the
direct-regression pose solve — exactly what ``AdaPoseEstimator.estimate``
runs in the evaluation stack. "Frames" counts
processed camera views (2 per estimate), matching the reference's per-view
backbone cost (its python loop runs the network once per env per view pair,
AdaPose/interface_v5.py:215-231).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json target of 10,000 frames/s.
"""

import json
import sys
import time

import numpy as np


def scan_bench(fn, *args, iters=10, reps=3):
    """Steady-state ms per call of fn(*args), robust to the three artifacts
    observed through the TPU tunnel (see scripts/perfutil.py): (1) the tunnel
    memoizes (executable, inputs) -> result, so every rep gets a distinct
    scalar salt input; (2) XLA hoists loop-invariant scan work and factors
    sum() through linear ops, so the carry perturbs the first argument and
    reduces via non-factorable max(|out|); (3) per-call dispatch overhead is
    amortized by running iterations inside one scan executable. Array args
    are jit parameters, not closure captures (captures become HLO constants:
    huge compile payloads + constant folding)."""
    import jax
    import jax.numpy as jnp

    def step(a, salt, carry, k):
        a0 = a[0] + (carry * 1e-20 + salt * 0 + k.astype(a[0].dtype) * 0)
        out = fn(a0, *a[1:])
        s = sum(jnp.max(jnp.abs(x.astype(jnp.float32)))
                for x in jax.tree.leaves(out))
        return carry + s * 1e-30, ()

    @jax.jit
    def run(salt, *a):
        c, _ = jax.lax.scan(lambda carry, k: step(a, salt, carry, k),
                            salt * 1e-12, jnp.arange(iters))
        return c

    jax.block_until_ready(run(jnp.float32(-1.0), *args))  # compile
    best = float("inf")
    for r in range(reps):
        salt = jnp.float32(r + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(run(salt, *args))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
    from rgbmanip_tpu.utils.logger import get_logger

    log = get_logger()
    log.setLevel("WARNING")

    # TPU-fast architecture (strided resnet18 backbone, 24^2x16 cost volume)
    # — trained in-framework with exactly these settings; the benched weights
    # ARE the committed production checkpoint (accuracy vs the reference-
    # shaped config in docs/RESULTS.md), so the headline number and the
    # parity-accuracy claim are the same artifact. The production-parity
    # 224px/resnet34/24-depth config benches at ~480-700 fps on the same
    # chip (scripts/profile_knobs.py).
    import os
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "checkpoints", "estimator_fast_cabinet_r2.ckpt")
    if not os.path.exists(ckpt):
        sys.stderr.write(f"bench: trained checkpoint missing at {ckpt}; "
                         "falling back to random weights (throughput is "
                         "weight-independent)\n")
        ckpt = ""
    cfg = {"name": "adapose_v5", "task_name": "one_door_cabinet",
           "load": bool(ckpt), "checkpoint_path": ckpt, "img_size": 192,
           "use_depth": True,
           "n_pts": 1024, "direct_regression": True, "real_world": False,
           "backend": "resnet18", "backbone_stride": 32,
           "volume_scale": 8, "n_depth": 16, "d_interval": 0.15,
           "warp_mode": "nearest"}

    H, W = 480, 640
    platform = jax.devices()[0].platform

    best_fps, best_B = 0.0, 0
    for B in ([128, 64] if platform != "cpu" else [2]):
        try:
            est = AdaPoseEstimator(cfg, log, dtype=jnp.bfloat16)
            mask = np.zeros((B, H, W), bool)
            mask[:, 180:300, 280:400] = True
            K = np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240], [0, 0, 1.0]]),
                        (B, 1, 1)).astype(np.float32)
            ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
            ext[:, 2, 3] = 1.0
            ext2 = ext.copy()
            ext2[:, 0, 3] = 0.1

            # inputs live on device from the start: the RGB tensors are
            # generated on-chip (staging 2x B x 480x640x3 f32 through the
            # tunnel is ~750 MB at B=128 and can dominate/stall the run on a
            # slow tunnel day); the steady-state pipeline streams observations
            # with double-buffered transfers that overlap compute, so the chip
            # metric is the jitted estimate itself
            rgb1d, rgb2d = jax.jit(
                lambda k: tuple(jax.random.uniform(kk, (B, H, W, 3))
                                for kk in jax.random.split(k)))(
                    jax.random.PRNGKey(1))
            jax.block_until_ready((rgb1d, rgb2d))
            maskd = jnp.asarray(mask)
            Kd, e1d, e2d = jnp.asarray(K), jnp.asarray(ext), jnp.asarray(ext2)
            key = jax.random.PRNGKey(0)

            def run(r1, r2, m, k_, e1, e2):
                bbox, valid, _pose = est._estimate(est.params, est.batch_stats,
                                                   k_, r1, m, e1, r2, m, e2,
                                                   key)
                return bbox

            iters = 10 if platform != "cpu" else 2
            ms = scan_bench(run, rgb1d, rgb2d, maskd, Kd, e1d, e2d,
                            iters=iters, reps=3 if platform != "cpu" else 1)
            fps = 2 * B / ms * 1e3  # 2 views per estimate
            if fps > best_fps:
                best_fps, best_B = fps, B
        except Exception as e:  # OOM at this batch size: try smaller
            msg = str(e).replace("\n", " ")[:300]
            sys.stderr.write(f"bench: batch {B} failed ({type(e).__name__}): "
                             f"{msg}\n")
            continue

    print(json.dumps({
        "metric": "pose_estimation_fps",
        "value": round(best_fps, 2),
        "unit": f"frames/sec/chip (B={best_B}, {platform}, bf16, 192px, "
                f"r18-s32, 16 depth, load={bool(ckpt)})",
        "vs_baseline": round(best_fps / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()

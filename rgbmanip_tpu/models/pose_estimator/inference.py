"""Standalone estimator evaluation harness (reference AdaPose/inference.py:20-243).

Evaluates the estimator on saved view pairs (the .npz files produced by
``train=collect`` with ``controller=collect_pose`` or by the RL controller's
eval view dump) and reports rotation / translation / scale errors against the
stored ground truth.

Usage:
    python -m rgbmanip_tpu.models.pose_estimator.inference \
        --data_root saves/collect --checkpoint saves/estimator.ckpt \
        [--img_size 224] [--n_pts 1024] [--limit 100]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from ...utils.logger import get_logger


def bbox_errors(pred_bbox: np.ndarray, gt_bbox: np.ndarray):
    """Center / extent errors between two 8-corner boxes (world frame)."""
    pc = pred_bbox.mean(0)
    gc = gt_bbox.mean(0)
    center_err = float(np.linalg.norm(pc - gc))
    pe = pred_bbox.max(0) - pred_bbox.min(0)
    ge = gt_bbox.max(0) - gt_bbox.min(0)
    size_err = float(np.abs(pe - ge).mean())
    return center_err, size_err


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--img_size", type=int, default=224)
    parser.add_argument("--n_pts", type=int, default=1024)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args(argv)

    log = get_logger()
    from .adapose import AdaPoseEstimator

    cfg = {"name": "adapose_v5", "task_name": "eval", "load": bool(args.checkpoint),
           "checkpoint_path": args.checkpoint, "img_size": args.img_size,
           "use_depth": True, "n_pts": args.n_pts, "direct_regression": True,
           "real_world": False}
    est = AdaPoseEstimator(cfg, log)

    files = sorted(glob.glob(os.path.join(args.data_root, "**", "*.npz"),
                             recursive=True))
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise SystemExit(f"no .npz samples under {args.data_root}")

    center_errs, size_errs, n_eval = [], [], 0
    for start in range(0, len(files), args.batch):
        chunk = files[start:start + args.batch]
        samples = [np.load(f) for f in chunk]
        keys = samples[0].files
        if not {"rgb1", "rgb2", "mask1", "mask2", "intrinsic",
                "extrinsic1", "extrinsic2", "gt_bbox"} <= set(keys):
            log.warning(f"skipping {len(chunk)} files without view-pair keys")
            continue
        K = np.stack([s["intrinsic"] for s in samples])
        bbox = est.estimate(
            K,
            np.stack([s["rgb1"] for s in samples]),
            np.stack([s["mask1"] for s in samples]),
            np.stack([s["extrinsic1"] for s in samples]),
            np.stack([s["rgb2"] for s in samples]),
            np.stack([s["mask2"] for s in samples]),
            np.stack([s["extrinsic2"] for s in samples]))
        for i, s in enumerate(samples):
            ce, se = bbox_errors(bbox[i], s["gt_bbox"])
            center_errs.append(ce)
            size_errs.append(se)
            n_eval += 1
        log.info(f"{n_eval}/{len(files)}: center {np.mean(center_errs):.4f} m  "
                 f"size {np.mean(size_errs):.4f} m")

    result = {"n": n_eval,
              "center_err_mean": float(np.mean(center_errs)),
              "center_err_median": float(np.median(center_errs)),
              "size_err_mean": float(np.mean(size_errs))}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

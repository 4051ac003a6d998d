"""collect -> inference roundtrip: the collection controller writes view
pairs; the inference harness evaluates an estimator on them."""

import glob
import os

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (prepare_controller, prepare_env,
                                prepare_manipulation, prepare_pose_estimator)
from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")


def test_collect_and_inference(tmp_path):
    cfg = load_config([
        "controller=collect_pose", "task=open_cabinet_no_dr", "task.num_envs=2",
        f"controller.learn.save_dir={tmp_path}",
    ])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], LOG)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], LOG)
        ctrl = prepare_controller(env, pe, manip, cfg["controller"], cfg, LOG)
        env.reset()
        ctrl.run()
        samples = sorted(glob.glob(os.path.join(tmp_path, "*.npz")))
        assert len(samples) == 2
        s = np.load(samples[0])
        assert {"rgb1", "rgb2", "mask1", "mask2", "intrinsic", "extrinsic1",
                "extrinsic2", "gt_bbox"} <= set(s.files)
        assert s["rgb1"].shape == (480, 640, 3)
        assert s["mask1"].sum() > 0

        # inference harness over the collected pairs (random-weight estimator,
        # small network config — validates the end-to-end data contract)
        from rgbmanip_tpu.models.pose_estimator import inference
        result = inference.main([
            "--data_root", str(tmp_path), "--img_size", "64",
            "--n_pts", "128", "--batch", "2"])
        assert result["n"] == 2
        assert np.isfinite(result["center_err_mean"])
    finally:
        env.close()

"""Baseline replay (train=test_baseline): action-file parsing in all the
reference's formats (reference train.py:307-365) and an end-to-end replay
with a pixel-coordinate action recovered through the stored Position map."""

import os
import pickle

import numpy as np
import pytest

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import test_baseline as run_test_baseline  # noqa: renamed to dodge pytest collection
from rgbmanip_tpu.train import (parse_baseline_actions, prepare_controller,
                                prepare_env, prepare_manipulation,
                                prepare_pose_estimator)
from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")

SETTINGS = {"sample_000000": {}, "other": {}}


def _posmap(key):
    pos = np.zeros((480, 640, 3), np.float32)
    pos[:, :, 0] = 1.25
    pos[:, :, 1] = -0.5
    pos[:, :, 2] = 0.75
    return pos


def test_parse_plain_whitespace(tmp_path):
    p = tmp_path / "actions.txt"
    p.write_text("sample_000000 0.5 0.1 0.4 -1 0 0\nmissing 0 0 0 1 0 0\n")
    acts = parse_baseline_actions(str(p), SETTINGS, _posmap)
    assert len(acts) == 1
    key, a = acts[0]
    assert key == "sample_000000"
    np.testing.assert_allclose(a, [0.5, 0.1, 0.4, -1, 0, 0])


def test_parse_comma_3d():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("sample_000000.pickle, [0.5, 0.1, 0.4], [-1 0 0]\n")
        path = f.name
    acts = parse_baseline_actions(path, SETTINGS, _posmap)
    os.unlink(path)
    assert len(acts) == 1
    np.testing.assert_allclose(acts[0][1], [0.5, 0.1, 0.4, -1, 0, 0])


def test_parse_comma_pixel():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("other, [120, 300], [-1, 0, 0]\n")
        path = f.name
    acts = parse_baseline_actions(path, SETTINGS, _posmap)
    os.unlink(path)
    assert len(acts) == 1
    np.testing.assert_allclose(acts[0][1], [1.25, -0.5, 0.75, -1, 0, 0])


def test_parse_w2a_report(tmp_path):
    p = tmp_path / "foo_w2a_report.txt"
    p.write_text("sample_000000 (120, 300) score [ -1 0 0 ] [ 0 1 0 ]\n")
    acts = parse_baseline_actions(str(p), SETTINGS, _posmap)
    assert len(acts) == 1
    np.testing.assert_allclose(acts[0][1], [1.25, -0.5, 0.75, -1, 0, 0])


def test_parse_pixel_without_position_map(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("other, [120, 300], [-1, 0, 0]\n")
    acts = parse_baseline_actions(str(p), SETTINGS, lambda k: None)
    assert acts == []


@pytest.mark.slow
def test_baseline_replay_pixel_e2e(tmp_path):
    """Collect one baseline setting (pickle + npz Position map), write a
    pixel-format action file aimed at the handle mask, replay it."""
    cfg = load_config([
        "controller=collect_baselines", "task=open_cabinet_no_dr",
        "task.num_envs=2", f"controller.learn.save_dir={tmp_path}",
    ])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], LOG)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], LOG)
        ctrl = prepare_controller(env, pe, manip, cfg["controller"], cfg, LOG)
        env.reset()
        ctrl.run()
        pkls = sorted(f for f in os.listdir(tmp_path) if f.endswith(".pkl"))
        assert pkls, "collection wrote no baseline settings"
        key = os.path.splitext(pkls[0])[0]
        npz = np.load(os.path.join(tmp_path, key + ".npz"))
        assert "position" in npz.files
        mask = npz["mask"]
        ys, xs = np.nonzero(mask)
        cy, cx = int(ys.mean()), int(xs.mean())
        actions = tmp_path / "actions.txt"
        actions.write_text(f"{key}, [{cy}, {cx}], [-1, 0, 0]\n")

        run_cfg = dict(cfg)
        run_cfg["train"] = dict(cfg["train"],
                                task_setting_root=str(tmp_path),
                                action_path=str(actions))
        from rgbmanip_tpu.models.controller.baseline import BaselineController
        bctrl = BaselineController(env, pe, manip, {"name": "baseline"}, LOG)
        run_test_baseline(env, bctrl, run_cfg, LOG)  # must not raise
    finally:
        env.close()

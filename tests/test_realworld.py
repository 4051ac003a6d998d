"""Real-world environment seam (reference env/realworld_envs/
base_realworld.py + AdaPose/interface_realworld.py): injected drivers,
hand-eye frame conversions, and the external-segmenter -> estimator path."""

import numpy as np
import pytest

from rgbmanip_tpu.envs.realworld.base_realworld import BaseRealworldEnv
from rgbmanip_tpu.models.pose_estimator.adapose import make_estimator
from rgbmanip_tpu.utils.logger import get_logger
from rgbmanip_tpu.utils.transform import Pose, quat_to_axis

LOG = get_logger()
LOG.setLevel("WARNING")


class FakeRobot:
    def __init__(self):
        self.pose = np.array([0.4, 0.0, 0.5, 0.0, 1.0, 0.0, 0.0])
        self.gripper = 0.04
        self.moves = []

    def hand_pose(self):
        return self.pose

    def move_to(self, pose7, duration=0.0):
        self.moves.append(np.asarray(pose7))
        self.pose = np.asarray(pose7, np.float64)

    def set_gripper(self, width):
        self.gripper = width


class FakeCamera:
    """Returns a fixed 480x640 frame with a bright square 'object'."""

    def capture(self):
        rgb = np.full((480, 640, 3), 0.2, np.float32)
        rgb[200:280, 280:360] = (0.9, 0.3, 0.1)
        depth = np.full((480, 640), 1.5, np.float32)
        K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        return rgb, depth, K


class FakeSAM:
    def predict(self, rgb):
        return (rgb[..., 0] > 0.5)  # the bright square


def make_env():
    return BaseRealworldEnv(robot_driver=FakeRobot(), camera_driver=FakeCamera(),
                            segmenter=FakeSAM(), logger=LOG)


def test_missing_driver_raises():
    env = BaseRealworldEnv(logger=LOG)
    with pytest.raises(RuntimeError, match="robot"):
        env.hand_pose()
    with pytest.raises(RuntimeError, match="camera"):
        env.get_image()


def test_hand_eye_frames_roundtrip():
    env = make_env()
    # cam_move_to(P) must put the CAMERA at P: hand = P * hand_cam_pose^-1,
    # so camera_pose() afterwards returns P
    target = Pose([0.5, 0.1, 0.6], [0.0, 1.0, 0.0, 0.0]).to_7d()
    env.cam_move_to(target[None])
    np.testing.assert_allclose(env.camera_pose()[0], target, atol=1e-9)
    # gripper_move_to(P): grip center sits 0.105 along hand z from the hand
    env.gripper_move_to(target[None])
    gp = env.gripper_pose()[0]
    np.testing.assert_allclose(gp, target, atol=1e-9)
    hp = env.hand_pose()[0]
    open_dir = quat_to_axis(hp[None, 3:], 2)[0]
    np.testing.assert_allclose(hp[:3] + 0.105 * open_dir, target[:3], atol=1e-9)


def test_get_image_contract():
    env = make_env()
    img = env.get_image()["camera0"]
    assert img["Color"].shape == (1, 480, 640, 3)
    assert img["Mask"].dtype == bool and img["Mask"].sum() == 80 * 80
    assert img["Intrinsic"].shape == (1, 3, 3)
    assert img["Extrinsic"].shape == (1, 4, 4)


def test_realworld_estimator_consumes_env_images():
    """make_estimator('realworld') runs the full jitted estimate on the
    realworld image dict (external segmenter masks, shared wrist-cam K)."""
    env = make_env()
    est = make_estimator("realworld", {
        "name": "adapose_realworld", "img_size": 64, "n_pts": 128,
        "n_depth": 8, "backend": "resnet10s", "load": False,
    }, LOG)
    # the real-demo pose branch replaces the volume-feature gather with an
    # MLP over (px, py, depth) (reference network_realworld.py:42-47,201-215)
    assert est.model.realworld_pts
    assert "camera_pts_mlp" in est.params
    i1 = env.get_image()["camera0"]
    env.cam_move_to(Pose([0.45, 0.15, 0.55], [0.0, 1.0, 0.0, 0.0]).to_7d()[None])
    i2 = env.get_image()["camera0"]
    bbox = est.estimate(i1["Intrinsic"], i1["Color"], i1["Mask"],
                        i1["Extrinsic"], i2["Color"], i2["Mask"],
                        i2["Extrinsic"])
    assert bbox.shape == (1, 8, 3)
    assert np.isfinite(bbox).all()
    # empty mask -> sentinel default bbox (+10 offset)
    empty = np.zeros_like(i1["Mask"])
    bbox2 = est.estimate(i1["Intrinsic"], i1["Color"], empty,
                         i1["Extrinsic"], i2["Color"], i2["Mask"],
                         i2["Extrinsic"])
    assert (bbox2 >= 9.0).all()


def test_default_calibration_file_loads():
    """The default hand-eye calibration path must exist in the tree and load
    (reference ships env/realworld_envs/panda_rs_handeyecalibration_eye_on_hand.yaml;
    a missing file silently falls back to a hardcoded transform)."""
    import os
    from rgbmanip_tpu.envs.realworld.base_realworld import (
        CALIB_FILE, BaseRealworldEnv)
    assert os.path.exists(CALIB_FILE), CALIB_FILE
    env = BaseRealworldEnv(logger=LOG)
    # values from the shipped fixture, not the hardcoded fallback
    assert abs(env.hand_cam_pose.p[0] - 0.07) < 1e-6
    assert abs(env.hand_cam_pose.q[3] - 0.7071068) < 1e-6

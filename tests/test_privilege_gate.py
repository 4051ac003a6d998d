"""Privileged-state gate for close_* dof feedback [VERDICT r4 weak-5]:
``env.obj_dof()`` may only steer the skill when the active estimator is the
ground-truth oracle. Under a learned estimator the skill must use the
proprioceptive swept-angle fallback."""

import logging

from rgbmanip_tpu.models.manipulation.close_cabinet import (
    CloseCabinetManipulation, CloseDrawerManipulation)
from rgbmanip_tpu.models.pose_estimator.groundtruth_estimator import (
    GroundTruthPoseEstimator)
from rgbmanip_tpu.train import prepare_controller

LOG = logging.getLogger("test")
CFG = {"name": "close_cabinet", "step_sizes": [0.1] * 6, "closed_loop": True}


def make(cfg=CFG):
    return CloseCabinetManipulation(env=object(), cfg=dict(cfg), logger=LOG)


def test_default_unstamped_is_proprioceptive():
    # constructed outside the factory chain: no privilege -> no dof reads
    assert make()._use_dof() is False


def test_gt_stack_gets_dof_feedback():
    m = make()
    m.privileged_ok = True
    assert m._use_dof() is True


def test_cfg_can_disable_even_for_gt():
    m = make(dict(CFG, dof_feedback=False))
    m.privileged_ok = True
    assert m._use_dof() is False


def test_prepare_controller_stamps_privilege():
    env = object()
    manip = make()
    gt = GroundTruthPoseEstimator(env, {"name": "ground_truth"}, LOG)
    prepare_controller(env, gt, manip, {"name": "gt_pose"}, {}, LOG)
    assert manip.privileged_ok is True

    class FakeLearnedEstimator:  # anything that is not the gt oracle
        pass

    manip2 = make()
    prepare_controller(env, FakeLearnedEstimator(), manip2,
                       {"name": "gt_pose"}, {}, LOG)
    assert manip2.privileged_ok is False
    assert manip2._use_dof() is False  # learned stack -> swept-angle path


def test_drawer_variant_shares_gate():
    m = CloseDrawerManipulation(env=object(), cfg=dict(CFG), logger=LOG)
    assert m._use_dof() is False
    m.privileged_ok = True
    assert m._use_dof() is True

"""Pick-mug scripted skill (reference models/manipulation/pick_mug.py:14-79):
side grasp along the handle direction (axis[1]), gripper x up, vertical lift."""

from __future__ import annotations

import numpy as np

from .base_manipulation import BaseManipulation
from .open_cabinet import batch_frame_quats


class PickMugManipulation(BaseManipulation):

    def plan_pathway(self, center, axis, eval=False):
        center = np.asarray(center, dtype=np.float64)
        axis = np.asarray(axis, dtype=np.float64)
        batch = center.shape[0]
        y_ = np.tile([0.0, 1.0, 0.0], (batch, 1))
        z_ = np.tile([0.0, 0.0, 1.0], (batch, 1))

        pre_grasp_axis = axis[:, 1].copy()
        pre_grasp_axis -= z_ * (pre_grasp_axis * z_).sum(-1, keepdims=True)
        norm = np.linalg.norm(pre_grasp_axis, axis=-1, keepdims=True)
        pre_grasp_axis = np.where(norm < 1e-8, y_, pre_grasp_axis / (norm + 1e-8))
        pre_grasp_p = center - pre_grasp_axis * 0.2
        pre_grasp_x = z_
        pre_grasp_z = pre_grasp_axis
        pre_grasp_y = np.cross(pre_grasp_z, pre_grasp_x)
        pre_grasp_q = batch_frame_quats(pre_grasp_x, pre_grasp_y, pre_grasp_z)
        pre_grasp_pose = np.concatenate([pre_grasp_p, pre_grasp_q], axis=-1)

        self.env.class_method("toggle_gripper", open=True)
        self.env.hand_move_to(pre_grasp_pose, time=2, wait=2, planner="path",
                              no_collision_with_front=False)

        grasp_p = pre_grasp_p + pre_grasp_axis * 0.06
        grasp_pose = np.concatenate([grasp_p, pre_grasp_q], axis=-1)
        self.env.hand_move_to(grasp_pose, time=2, wait=1,
                              planner="ik" if self.cfg["closed_loop"] else "path")
        self.env.class_method("_release_target")
        self.env.class_method("toggle_gripper", open=False)

        # Miss-recovery probes (ours, r5; cfg-gated `regrasp`): the reference
        # skill is open-loop on the estimate, so a center error beyond the
        # gripper's ~2 cm vertical tolerance is an unrecoverable miss. A miss
        # is observable proprioceptively (the gripper senses whether anything
        # held the fingers apart — the same env.grasped() seam close_cabinet's
        # lost-grasp detection reads), so retry the grasp at small vertical /
        # approach offsets around the estimate before lifting. No ground
        # truth: the probe pattern is blind and fixed.
        if self.cfg.get("regrasp", True):
            # Probe set selected by A/B at 104 eps/split: vertical +-1.8 cm
            # then deeper approach (+2.5 cm) measured 37.5/29.8; adding
            # lateral +-2.5 cm probes gained nothing on test and LOST 2.9 on
            # train (re-approach can rake the handle sideways), so lateral
            # probes are excluded.
            lat = np.cross(z_, pre_grasp_axis)
            probes = [(0.0, 0.018, 0.0), (0.0, -0.018, 0.0),
                      (0.025, 0.0, 0.0)]
            for d_ax, dz, d_lat in probes:
                missed = ~self.env.grasped().astype(bool)
                if not missed.any():
                    break
                idx = np.nonzero(missed)[0]
                self.env.class_method("toggle_gripper", open=True, indices=idx)
                # back off to the standoff so the re-approach cannot rake the
                # handle sideways, then approach the offset grasp point
                self.env.hand_move_to(pre_grasp_pose, time=1, wait=0.5,
                                      planner="ik", indices=idx)
                probe_p = grasp_p + pre_grasp_axis * d_ax + z_ * dz + lat * d_lat
                probe_pose = np.concatenate([probe_p, pre_grasp_q], axis=-1)
                self.env.hand_move_to(probe_pose, time=2, wait=1,
                                      planner="ik", indices=idx)
                self.env.class_method("_release_target", indices=idx)
                self.env.class_method("toggle_gripper", open=False, indices=idx)

        cur_dir = pre_grasp_axis
        for step_size in self.cfg["step_sizes"]:
            cur_p = self.env.gripper_pose()[:, :3]
            pred_p = cur_p + z_ * step_size  # lift vertically
            next_x = z_
            next_z = cur_dir
            next_y = np.cross(next_z, next_x)
            pred_q = batch_frame_quats(next_x, next_y, next_z)
            pred_pose = np.concatenate([pred_p, pred_q], axis=-1)
            self.env.gripper_move_to(
                pred_pose, time=step_size * 10, wait=step_size * 5,
                planner="ik" if self.cfg["closed_loop"] else "path")

"""Close-cabinet/drawer scripted skills (reference
models/manipulation/close_{cabinet,drawer}.py): grasp the handle of the open
part, then push along +approach (cur_dir = +pre_grasp_axis) to close it."""

from __future__ import annotations

import numpy as np

from .base_manipulation import BaseManipulation
from .open_cabinet import batch_frame_quats
from ...utils.transform import normalize


class CloseCabinetManipulation(BaseManipulation):

    GRIP_X_SIGN = -1.0  # vertical-handle grip (cabinet)

    def plan_pathway(self, center, axis, eval=False):
        center = np.asarray(center, dtype=np.float64)
        axis = np.asarray(axis, dtype=np.float64)
        batch = center.shape[0]
        y_ = np.tile([0.0, 1.0, 0.0], (batch, 1))
        z_ = np.tile([0.0, 0.0, 1.0], (batch, 1))

        pre_grasp_axis = axis[:, 0].copy()
        pre_grasp_axis -= z_ * (pre_grasp_axis * z_).sum(-1, keepdims=True)
        norm = np.linalg.norm(pre_grasp_axis, axis=-1, keepdims=True)
        pre_grasp_axis = np.where(norm < 1e-8, y_, pre_grasp_axis / (norm + 1e-8))
        pre_grasp_p = center - pre_grasp_axis * 0.2
        pre_grasp_x = self.GRIP_X_SIGN * z_
        pre_grasp_z = pre_grasp_axis
        pre_grasp_y = np.cross(pre_grasp_z, pre_grasp_x)
        pre_grasp_q = batch_frame_quats(pre_grasp_x, pre_grasp_y, pre_grasp_z)
        pre_grasp_pose = np.concatenate([pre_grasp_p, pre_grasp_q], axis=-1)

        self.env.class_method("toggle_gripper", open=True)
        self.env.hand_move_to(pre_grasp_pose, time=2, wait=2, planner="path",
                              no_collision_with_front=True)

        grasp_p = pre_grasp_p + pre_grasp_axis * 0.18
        grasp_pose = np.concatenate([grasp_p, pre_grasp_q], axis=-1)
        self.env.hand_move_to(grasp_pose, time=2, wait=1, planner="ik")
        self.env.class_method("toggle_gripper", open=False)

        # Push along +approach to close. The gripper keeps FACING the door
        # (next_z = +cur_dir): the reference's close skill reuses the pull
        # loop's next_z = -cur_dir (close_cabinet.py:66-67), which for a push
        # flips the hand 180 deg away from the grasp orientation mid-hold and
        # breaks it — a deliberate behavioral fix (the reference records no
        # close-task numbers).
        cur_dir = pre_grasp_axis
        init_dir = pre_grasp_axis.copy()
        start_p = self.env.gripper_pose()[:, :3]
        peak = np.zeros(batch)
        for step_size in self.cfg["step_sizes"]:
            cur_p = self.env.gripper_pose()[:, :3]
            pred_p = cur_p + cur_dir * step_size
            next_x = self.GRIP_X_SIGN * z_
            next_z = cur_dir
            next_y = np.cross(next_z, next_x)
            pred_q = batch_frame_quats(next_x, next_y, next_z)
            pred_pose = np.concatenate([pred_p, pred_q], axis=-1)
            self.env.gripper_move_to(pred_pose, time=step_size * 10,
                                     wait=step_size * 5)
            new_p = self.env.gripper_pose()[:, :3]
            raw = new_p - cur_p
            raw[:, 2] = 0.0
            # Only trust the achieved-motion direction when there WAS motion:
            # once the door reaches its limit the hand stalls, normalize(~0)
            # is noise, and a corrupted cur_dir drags the grasped door back
            # open on the next push.
            moved = np.linalg.norm(raw, axis=-1) > 0.3 * step_size
            new_dir = normalize(raw)
            delta = new_dir - cur_dir
            dot = np.clip((new_dir * cur_dir).sum(-1, keepdims=True), -1, 1)
            upd = normalize(cur_dir + 2 * delta * dot)
            cur_dir = np.where(moved[:, None], upd, cur_dir)
            # Reopening guard: the reflection update tracks the achieved arc
            # in WHICHEVER swing sense the episode stumbled into — once a
            # grasp disturbance starts the door swinging open, the update
            # locks onto the opening arc and happily opens it all the way
            # (traced in scripts/trace_close3.py). Closing must move the
            # handle monotonically inward: when the displacement along the
            # initial inward axis regresses >3 cm from its running PEAK
            # (not the grasp start — slow re-opening after early progress
            # stays net-positive for many steps), flip the push direction
            # back along the arc.
            net = new_p - start_p
            net[:, 2] = 0.0
            proj = (net * init_dir).sum(-1)
            reopened = proj < peak - 0.03
            peak = np.maximum(peak, proj)
            cur_dir = np.where(reopened[:, None], -cur_dir, cur_dir)


class CloseDrawerManipulation(CloseCabinetManipulation):
    """Horizontal-handle grip; straight push (reference close_drawer.py)."""

    def plan_pathway(self, center, axis, eval=False):
        center = np.asarray(center, dtype=np.float64)
        axis = np.asarray(axis, dtype=np.float64)
        batch = center.shape[0]
        y_ = np.tile([0.0, 1.0, 0.0], (batch, 1))
        z_ = np.tile([0.0, 0.0, 1.0], (batch, 1))

        pre_grasp_axis = axis[:, 0].copy()
        pre_grasp_axis -= z_ * (pre_grasp_axis * z_).sum(-1, keepdims=True)
        norm = np.linalg.norm(pre_grasp_axis, axis=-1, keepdims=True)
        pre_grasp_axis = np.where(norm < 1e-8, y_, pre_grasp_axis / (norm + 1e-8))
        pre_grasp_p = center - pre_grasp_axis * 0.2
        pre_grasp_y = -z_
        pre_grasp_z = pre_grasp_axis
        pre_grasp_x = np.cross(pre_grasp_y, pre_grasp_z)
        pre_grasp_q = batch_frame_quats(pre_grasp_x, pre_grasp_y, pre_grasp_z)
        pre_grasp_pose = np.concatenate([pre_grasp_p, pre_grasp_q], axis=-1)

        self.env.class_method("toggle_gripper", open=True)
        self.env.hand_move_to(pre_grasp_pose, time=2, wait=2, planner="path",
                              no_collision_with_front=True)

        grasp_p = pre_grasp_p + pre_grasp_axis * 0.18
        grasp_pose = np.concatenate([grasp_p, pre_grasp_q], axis=-1)
        self.env.hand_move_to(grasp_pose, time=2, wait=1, planner="ik")
        self.env.class_method("toggle_gripper", open=False)

        cur_dir = pre_grasp_axis
        for step_size in self.cfg["step_sizes"]:
            cur_p = self.env.gripper_pose()[:, :3]
            pred_p = cur_p + cur_dir * step_size
            next_y = -z_
            next_z = -cur_dir
            next_x = np.cross(next_y, next_z)
            pred_q = batch_frame_quats(next_x, next_y, next_z)
            pred_pose = np.concatenate([pred_p, pred_q], axis=-1)
            self.env.gripper_move_to(pred_pose, time=step_size * 10,
                                     wait=step_size * 5)

"""Phase-level trace of close_cabinet: dof after approach / grasp-move / close / each push."""
import sys

sys.path.insert(0, ".")

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import prepare_env, prepare_manipulation, prepare_pose_estimator, prepare_controller
from rgbmanip_tpu.utils.logger import get_logger
from rgbmanip_tpu.models.manipulation.open_cabinet import batch_frame_quats
from rgbmanip_tpu.utils.transform import normalize

task = sys.argv[1] if len(sys.argv) > 1 else "close_cabinet"
cfg = load_config([f"dataset=cabinet_train", f"task={task}", f"manipulation={task}",
                   "controller=gt_pose", "pose_estimator=ground_truth",
                   "train=test", "task.num_envs=8"])
log = get_logger()
env = prepare_env(cfg["task"], cfg["dataset"], True, False, log, seed=0)
manip = prepare_manipulation(env, cfg["manipulation"], log)
est = prepare_pose_estimator(env, cfg["pose_estimator"], log)
ctrl = prepare_controller(env, est, manip, cfg["controller"], cfg, log)


def dof():
    return env.obj_dof()[:, 0].copy()


def plan(center, axis, eval=False):
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
    pre_grasp_x = manip.GRIP_X_SIGN * z_
    pre_grasp_z = pre_grasp_axis
    pre_grasp_y = np.cross(pre_grasp_z, pre_grasp_x)
    pre_grasp_q = batch_frame_quats(pre_grasp_x, pre_grasp_y, pre_grasp_z)
    pre_grasp_pose = np.concatenate([pre_grasp_p, pre_grasp_q], axis=-1)
    print("dof init    :", np.round(dof(), 3))
    env.class_method("toggle_gripper", open=True)
    env.hand_move_to(pre_grasp_pose, time=2, wait=2, planner="path",
                     no_collision_with_front=True)
    print("dof approach:", np.round(dof(), 3))
    # hand position error vs target
    hp = env.gripper_pose()[:, :3]
    err = np.linalg.norm(hp - (pre_grasp_p + pre_grasp_axis * 0.105), axis=-1)
    print("pregrasp err:", np.round(err, 3))
    grasp_p = pre_grasp_p + pre_grasp_axis * 0.18
    grasp_pose = np.concatenate([grasp_p, pre_grasp_q], axis=-1)
    env.hand_move_to(grasp_pose, time=2, wait=1, planner="ik")
    print("dof graspmv :", np.round(dof(), 3))
    hp = env.gripper_pose()[:, :3]
    err = np.linalg.norm(hp - (grasp_p + pre_grasp_axis * 0.105), axis=-1)
    print("grasp err   :", np.round(err, 3))
    env.class_method("toggle_gripper", open=False)
    print("grasped     :", env.grasped().astype(int))
    cur_dir = pre_grasp_axis
    for step_size in manip.cfg["step_sizes"]:
        cur_p = env.gripper_pose()[:, :3]
        pred_p = cur_p + cur_dir * step_size
        next_x = manip.GRIP_X_SIGN * z_
        next_z = -cur_dir
        next_y = np.cross(next_z, next_x)
        pred_q = batch_frame_quats(next_x, next_y, next_z)
        pred_pose = np.concatenate([pred_p, pred_q], axis=-1)
        env.gripper_move_to(pred_pose, time=step_size * 10, wait=step_size * 5)
        print(f"dof push {step_size}:", np.round(dof(), 3), "grasped:", env.grasped().astype(int))
        new_p = env.gripper_pose()[:, :3]
        new_dir = new_p - cur_p
        new_dir[:, 2] = 0.0
        new_dir = normalize(new_dir)
        delta = new_dir - cur_dir
        dot = np.clip((new_dir * cur_dir).sum(-1, keepdims=True), -1, 1)
        cur_dir = normalize(cur_dir + 2 * delta * dot)


manip.plan_pathway = plan
env.reset()
ctrl.run(eval=True)
print("success:", env.get_observation()["success"].astype(int))

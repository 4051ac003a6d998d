"""Trace close_cabinet failures: per-episode grasp engagement, dof trajectory.

Usage: python scripts/trace_close.py [close_cabinet|close_drawer] [episodes]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import prepare_env, prepare_manipulation, prepare_pose_estimator, prepare_controller
from rgbmanip_tpu.utils.logger import get_logger

task = sys.argv[1] if len(sys.argv) > 1 else "close_cabinet"
n_eps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ds = "cabinet_train" if "cabinet" in task else "drawer_train"
cfg = load_config([f"dataset={ds}", f"task={task}", f"manipulation={task}",
                   "controller=gt_pose", "pose_estimator=ground_truth",
                   "train=test", "task.num_envs=8"])
log = get_logger()
env = prepare_env(cfg["task"], cfg["dataset"], True, False, log, seed=0)
manip = prepare_manipulation(env, cfg["manipulation"], log)
est = prepare_pose_estimator(env, cfg["pose_estimator"], log)
ctrl = prepare_controller(env, est, manip, cfg["controller"], cfg, log)

# monkeypatch the push loop to record dof before/after each phase
orig_plan = manip.plan_pathway
rows = []

def plan(center, axis, eval=False):
    dof0 = env.obj_dof()[:, 0].copy()
    # run up to grasp: replicate skill phases by instrumenting gripper_move_to
    orig_plan(center, axis, eval=eval)
    rows.append((dof0, env.grasped().copy(), env.obj_dof()[:, 0].copy()))

manip.plan_pathway = plan
succ = 0
tot = 0
for rnd in range(n_eps // env.num_envs):
    env.reset()
    ctrl.run(eval=True)
    obs = env.get_observation()
    s = obs["success"]
    dof0, grasped, dof1 = rows[-1]
    for i in range(env.num_envs):
        print(f"ep {tot+i}: dof0={dof0[i]:.3f} grasped={int(grasped[i])} "
              f"dof_end={dof1[i]:.3f} thr={env.obj_success_dof[0]:.3f} "
              f"success={int(s[i])}")
    succ += s.sum()
    tot += env.num_envs
print(f"success {succ}/{tot} = {succ/tot*100:.1f}%")

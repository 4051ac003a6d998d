"""Categorize close_cabinet failures: run the REAL skill, record dof after
grasp and after each push step (by wrapping env.gripper_move_to), plus
grasped state, for N rounds. Prints a per-episode table + failure buckets."""
import sys

sys.path.insert(0, ".")

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (prepare_env, prepare_manipulation,
                                prepare_pose_estimator, prepare_controller)
from rgbmanip_tpu.utils.logger import get_logger

task = sys.argv[1] if len(sys.argv) > 1 else "close_cabinet"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
dataset = sys.argv[3] if len(sys.argv) > 3 else "cabinet_train"
cfg = load_config([f"dataset={dataset}", f"task={task}",
                   f"manipulation={task}", "controller=gt_pose",
                   "pose_estimator=ground_truth", "train=test",
                   "task.num_envs=8"])
log = get_logger(); log.setLevel("WARNING")
env = prepare_env(cfg["task"], cfg["dataset"], True, False, log, seed=0)
manip = prepare_manipulation(env, cfg["manipulation"], log)
est = prepare_pose_estimator(env, cfg["pose_estimator"], log)
ctrl = prepare_controller(env, est, manip, cfg["controller"], cfg, log)

trace = []


def wrap(name, tag):
    orig = getattr(env, name)

    def f(*a, **kw):
        r = orig(*a, **kw)
        trace.append((tag, env.obj_dof()[:, 0].copy(),
                      env.grasped().astype(int).copy()))
        return r

    setattr(env, name, f)


wrap("gripper_move_to", "push")
wrap("hand_move_to", "hand")
orig_cm = env.class_method


def traced_cm(name, **kw):
    r = orig_cm(name, **kw)
    if name == "toggle_gripper":
        trace.append(("grip", env.obj_dof()[:, 0].copy(),
                      env.grasped().astype(int).copy()))
    return r


env.class_method = traced_cm

for rnd in range(rounds):
    env.reset()
    trace.clear()
    d0 = env.obj_dof()[:, 0].copy()
    ctrl.run(eval=True)
    obs = env.get_observation()
    succ = obs["success"].astype(int)
    dN = env.obj_dof()[:, 0].copy()
    print(f"--- round {rnd}: success {succ.sum()}/{len(succ)}")
    for e in range(len(succ)):
        steps = " ".join(f"{tag[0]}{v[e]:.2f}{'*' if g[e] else ' '}"
                         for tag, v, g in trace)
        print(f"  env{e} init {d0[e]:.2f} -> {dN[e]:.2f} "
              f"succ={succ[e]} | {steps}")

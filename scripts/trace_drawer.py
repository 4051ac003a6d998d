"""Categorize open_drawer failures with the gt stack: record dof after the
grasp and after each pull step, plus grasped state, over N rounds.
Buckets: never-grasped, grasped-but-slipped (dof regressed), partial pull
(ended below success_dof), planner/approach failures (no grasp attempt)."""
import sys

sys.path.insert(0, ".")

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (prepare_env, prepare_manipulation,
                                prepare_pose_estimator, prepare_controller)
from rgbmanip_tpu.utils.logger import get_logger

split = sys.argv[1] if len(sys.argv) > 1 else "drawer_train"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
task = sys.argv[3] if len(sys.argv) > 3 else "open_drawer"
manip_name = sys.argv[4] if len(sys.argv) > 4 else task
cfg = load_config([f"dataset={split}", f"task={task}",
                   f"manipulation={manip_name}", "controller=gt_pose",
                   "pose_estimator=ground_truth", "train=test",
                   "task.num_envs=8"])
log = get_logger(); log.setLevel("WARNING")
env = prepare_env(cfg["task"], cfg["dataset"], True, False, log, seed=0)
manip = prepare_manipulation(env, cfg["manipulation"], log)
est = prepare_pose_estimator(env, cfg["pose_estimator"], log)
ctrl = prepare_controller(env, est, manip, cfg["controller"], cfg, log)

success_dof = cfg["task"]["object_conf"]["success_dof"]
inverted = task.startswith("close")  # close tasks succeed when dof DROPS below
trace = []


def wrap(name, tag):
    orig = getattr(env, name)

    def f(*a, **kw):
        r = orig(*a, **kw)
        trace.append((tag, env.obj_dof()[:, 0].copy(),
                      env.grasped().astype(int).copy()))
        return r

    setattr(env, name, f)


wrap("gripper_move_to", "move")
wrap("hand_move_to", "hand")
orig_cm = env.class_method


def traced_cm(name, **kw):
    r = orig_cm(name, **kw)
    if name == "toggle_gripper":
        trace.append(("grip", env.obj_dof()[:, 0].copy(),
                      env.grasped().astype(int).copy()))
    return r


env.class_method = traced_cm

buckets = {"success": 0, "never_grasped": 0, "slipped": 0, "partial": 0}
for rnd in range(rounds):
    trace.clear()
    ctrl.run()
    dof = env.obj_dof()[:, 0]
    ok = (dof < success_dof) if inverted else (dof > success_dof)
    # per-env episode analysis from the trace
    steps = np.stack([t[1] for t in trace])          # (T, N)
    grasped = np.stack([t[2] for t in trace])        # (T, N)
    for i in range(len(dof)):
        if ok[i]:
            buckets["success"] += 1
            continue
        gi = grasped[:, i]
        di = steps[:, i]
        if not gi.any():
            buckets["never_grasped"] += 1
            tag = "never_grasped"
        elif di.max() - di[-1] > 0.03 or (gi.any() and not gi[-1]):
            buckets["slipped"] += 1
            tag = "slipped"
        else:
            buckets["partial"] += 1
            tag = "partial"
        print(f"rnd {rnd} env {i}: FAIL {tag} dof_end={dof[i]:.3f} "
              f"dof_max={di.max():.3f} grasp_frac={gi.mean():.2f} "
              f"dofs={np.round(di, 3).tolist()}")
    env.reset()

n = rounds * env.num_envs
print(f"\n=== {task}/{split}: {n} episodes, success_dof={success_dof}")
for k, v in buckets.items():
    print(f"  {k:>14}: {v:3d}  ({100.0 * v / n:.1f}%)")

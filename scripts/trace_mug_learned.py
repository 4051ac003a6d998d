#!/usr/bin/env python
"""Mug miss anatomy under the LEARNED estimator: per env-episode, record the
estimate's signed center-error components (approach-axis, lateral, vertical),
whether the grasp engaged (after regrasp probes), and success — to direct
the probe pattern in pick_mug.plan_pathway.

Usage: python scripts/trace_mug_learned.py [mug_test] [rounds=8]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (prepare_controller, prepare_env,
                                prepare_manipulation, prepare_pose_estimator)
from rgbmanip_tpu.utils.logger import get_logger

split = sys.argv[1] if len(sys.argv) > 1 else "mug_test"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ckpt = "checkpoints/estimator_fast_mug_fine_r5.ckpt"
cfg = load_config([f"dataset={split}", "task=pick_mug",
                   "manipulation=pick_mug", "controller=heuristic_pose",
                   "pose_estimator=adapose_mug_fast",
                   f"pose_estimator.checkpoint_path={ckpt}",
                   "pose_estimator.d_min=0.35", "pose_estimator.d_interval=0.08",
                   "train=test", "task.num_envs=8", "seed=11"])
log = get_logger(); log.setLevel("WARNING")
env = prepare_env(cfg["task"], cfg["dataset"], True, False, log, seed=11)
manip = prepare_manipulation(env, cfg["manipulation"], log)
est = prepare_pose_estimator(env, cfg["pose_estimator"], log)
ctrl = prepare_controller(env, est, manip, cfg["controller"], cfg, log)

rows = []  # (e_approach, e_lat, e_z, err_norm, grasped, success)
orig_pp = manip.plan_pathway


def traced_pp(center, axis, eval=False):
    gt = np.asarray(env.get_observation(gt=True)["handle_bbox"])
    gt_center = gt.mean(axis=1)  # true box center, ordering-independent
    err = np.asarray(center) - gt_center          # (N, 3) signed world error
    ax = np.asarray(axis)[:, 1].copy()            # approach = handle dir
    z_ = np.array([0.0, 0.0, 1.0])
    ax[:, 2] = 0.0                                # horizontal projection
    n = np.linalg.norm(ax, axis=-1, keepdims=True) + 1e-9
    ax /= n
    lat = np.cross(np.tile(z_, (len(ax), 1)), ax)
    e_app = (err * ax).sum(-1)
    e_lat = (err * lat).sum(-1)
    e_z = err[:, 2]
    out = orig_pp(center, axis, eval)
    grasped = env.grasped().astype(bool)
    succ = np.asarray(env.get_observation(gt=True)["success"]).reshape(-1)
    for i in range(len(e_app)):
        rows.append((e_app[i], e_lat[i], e_z[i],
                     float(np.linalg.norm(err[i])), bool(grasped[i]),
                     bool(succ[i])))
    return out


manip.plan_pathway = traced_pp
for r in range(rounds):
    env.reset()
    ctrl.run(eval=True)
    print(f"round {r + 1}/{rounds}", flush=True)

a = np.array([(p, l, z, e, g, s) for p, l, z, e, g, s in rows])
g = a[:, 4] > 0.5
s = a[:, 5] > 0.5
print(f"\n{len(a)} episodes: grasped {g.mean()*100:.1f}%  success {s.mean()*100:.1f}%")
for name, m in (("grasped", g), ("NOT grasped", ~g)):
    if m.sum() == 0:
        continue
    r = a[m]
    print(f"{name:12s} n={m.sum():3d}  |e_app| med {np.median(np.abs(r[:,0]))*100:.1f}cm"
          f"  |e_lat| med {np.median(np.abs(r[:,1]))*100:.1f}cm"
          f"  |e_z| med {np.median(np.abs(r[:,2]))*100:.1f}cm"
          f"  |err| med {np.median(r[:,3])*100:.1f}cm")
ng = a[~g]
if len(ng):
    print("NOT-grasped signed comps: e_app med %.1f cm, e_lat med %.1f, e_z med %.1f"
          % tuple(np.median(ng[:, i]) * 100 for i in range(3)))
    print("NOT-grasped |err|>3cm: %.0f%%  |e_z|>1.8cm: %.0f%%  |e_lat|>2cm: %.0f%%"
          % ((np.abs(ng[:, 3]) > 0.03).mean() * 100,
             (np.abs(ng[:, 2]) > 0.018).mean() * 100,
             (np.abs(ng[:, 1]) > 0.02).mean() * 100))
env.close()

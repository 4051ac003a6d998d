#!/usr/bin/env python
"""Full evaluation sweep: every task x split at >=100 episodes, one JSON +
markdown table (VERDICT r1 item 10 — reference evals are 100-round,
cfg/train/test.yaml:5).

Usage: python scripts/eval_sweep.py [rounds] [controller] [pose_estimator]
  controller: gt_pose (default) | heuristic_pose | rl
  pose_estimator: ground_truth (default) | adapose_cabinet_fast | ...
extra argv tokens with '=' are passed through as config overrides
(e.g. pose_estimator.checkpoint_path=saves/x.ckpt controller.load=...).
"""
import json
import sys
import time

sys.path.insert(0, ".")

ROWS = [
    # task, manipulation, [(split-name, dataset)...]
    ("open_cabinet", "open_cabinet", [("train", "cabinet_train"), ("test", "cabinet_test")]),
    ("open_cabinet_45", "open_cabinet", [("train", "cabinet_train"), ("test", "cabinet_test")]),
    ("open_drawer", "open_drawer", [("train", "drawer_train"), ("test", "drawer_test")]),
    ("open_drawer_30", "open_drawer", [("train", "drawer_train"), ("test", "drawer_test")]),
    ("open_pot", "open_pot", [("train", "pot_train"), ("test", "pot_test")]),
    ("pick_mug", "pick_mug", [("train", "mug_train"), ("test", "mug_test")]),
    ("close_cabinet", "close_cabinet", [("train", "cabinet_train"), ("test", "cabinet_test")]),
    ("close_drawer", "close_drawer", [("train", "drawer_train"), ("test", "drawer_test")]),
]


def main():
    args = sys.argv[1:]
    passthru = [a for a in args if "=" in a]
    pos = [a for a in args if "=" not in a]
    rounds = int(pos[0]) if len(pos) > 0 else 104
    controller = pos[1] if len(pos) > 1 else "gt_pose"
    estimator = pos[2] if len(pos) > 2 else "ground_truth"

    from rgbmanip_tpu.config import load_config
    from rgbmanip_tpu.train import (prepare_controller, prepare_env,
                                    prepare_manipulation,
                                    prepare_pose_estimator, test as run_test)
    from rgbmanip_tpu.utils.logger import get_logger

    log = get_logger()
    log.setLevel("WARNING")
    results = {}
    t0 = time.time()
    for task, manip_name, splits in ROWS:
        cat_ok = estimator == "ground_truth" or \
            any(k in estimator for k in task.split("_"))
        for split, dataset in splits:
            key = f"{task}/{split}"
            overrides = [
                f"dataset={dataset}", f"task={task}",
                f"manipulation={manip_name}", f"controller={controller}",
                f"pose_estimator={estimator if cat_ok else 'ground_truth'}",
                "train=test", f"train.total_round={rounds}",
                "task.num_envs=8",
            ] + passthru
            try:
                cfg = load_config(overrides)
                env = prepare_env(cfg["task"], cfg["dataset"], log=log, seed=0)
                try:
                    manip = prepare_manipulation(env, cfg["manipulation"], log)
                    pe = prepare_pose_estimator(env, cfg["pose_estimator"], log)
                    ctrl = prepare_controller(env, pe, manip, cfg["controller"],
                                              cfg, log)
                    r = run_test(env, ctrl, cfg, log)
                finally:
                    env.close()
                results[key] = {"success": round(r["success_rate"], 2),
                                "move": round(r["move_distance"], 3),
                                "episodes": r["rounds"]}
                print(f"{key:28s}: {r['success_rate']:6.2f}% "
                      f"({r['rounds']} eps)", flush=True)
            except Exception as e:  # record, keep sweeping
                results[key] = {"error": f"{type(e).__name__}: {e}"}
                print(f"{key:28s}: ERROR {e}", flush=True)
    out = {"controller": controller, "estimator": estimator,
           "rounds": rounds, "results": results,
           "wall_s": round(time.time() - t0, 1)}
    fname = f"docs/sweep_{controller}_{estimator}.json"
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {fname} in {out['wall_s']}s")


if __name__ == "__main__":
    main()

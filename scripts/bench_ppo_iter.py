#!/usr/bin/env python
"""Full PPO iteration (rollout collect + fused update) throughput at the
BASELINE shape: controller=rl, open_cabinet, gt obs, num_envs=64, T=16
(BASELINE.json "PPO env-steps/sec (num_envs=64)").

Drives the real training stack (train.py factories + PPO.run) for a few
iterations and reports env-steps/s = T*N/(collect+learn) for the best
iteration, plus the split. Compare against:
  - the reference's own fps formula (algo/ppo/ppo/ppo.py:324) with its
    update() timed by scripts/bench_ref_ppo_update.py on this host, and
  - our fused-update-only figure (scripts/bench_ppo_update.py, 8.44 ms).

Collection is host-sim-bound on this box (C++ renders + python reward
terms); the reference's SAPIEN collection is likewise host-bound.

Usage: python scripts/bench_ppo_iter.py [num_envs] [iters]
"""
import re
import sys
import time

sys.path.insert(0, ".")


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rgbmanip_tpu.config import load_config
    from rgbmanip_tpu.train import (prepare_controller, prepare_env,
                                    prepare_manipulation,
                                    prepare_pose_estimator)
    from rgbmanip_tpu.utils.logger import get_logger

    log = get_logger()
    cfg = load_config([
        "dataset=cabinet_train", "task=open_cabinet",
        "manipulation=open_cabinet", "controller=rl",
        "pose_estimator=ground_truth", "train=controller",
        f"task.num_envs={num_envs}", "exp_name=bench_iter",
        "controller.learn.save_dir=/tmp/bench_iter_saves",
    ])
    env = prepare_env(cfg["task"], cfg["dataset"], log=log, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], log)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], log)
        ctrl = prepare_controller(env, pe, manip, cfg["controller"], cfg, log)

        # capture the per-iteration collect/learn log lines
        times = []
        pat = re.compile(r"collect ([\d.]+)s learn ([\d.]+)s")

        class Tap:
            def write(self, msg):
                m = pat.search(msg)
                if m:
                    times.append((float(m.group(1)), float(m.group(2))))
            def flush(self):
                pass

        import logging
        h = logging.StreamHandler(Tap())
        h.setLevel(logging.INFO)
        log.addHandler(h)

        t0 = time.time()
        ctrl.train_controller(iters)
        wall = time.time() - t0
    finally:
        env.close()

    T = cfg["controller"]["learn"]["num_transitions_per_env"]
    if not times:
        print(f"no iteration timings captured (wall {wall:.1f}s)")
        return
    best = min(times, key=lambda ct: ct[0] + ct[1])
    fps = T * num_envs / (best[0] + best[1])
    print(f"PPO full iteration at T={T} N={num_envs}: best collect "
          f"{best[0]:.2f}s + learn {best[1]:.3f}s = {fps:.1f} env-steps/s "
          f"({len(times)} iters, wall {wall:.1f}s)")


if __name__ == "__main__":
    main()

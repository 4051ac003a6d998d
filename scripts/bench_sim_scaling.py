#!/usr/bin/env python
"""Collection/rollout scaling of the C++ SimPool (BASELINE target 2's
rollout half — VERDICT r4 item 7).

This box exposes ONE CPU core, so absolute speedup from threads is not
measurable here; what IS measurable:

  1. env-count efficiency at fixed threads: time(N envs) / (N * time(1 env))
     ~= 1 means the pool distributes per-env work with no serialization
     overhead (locks, false sharing, queue contention) as the batch grows;
  2. thread oversubscription at fixed envs: more workers than cores must
     not DEGRADE throughput (broken locking or convoying would).

Together these back the claim that collection parallelizes across pool
threads on a multi-core production host: per-env work is independent
(verified 1.), and adding workers is at worst neutral on 1 core
(verified 2.), so with C cores the pool runs min(C, n_envs) envs truly
concurrently.

Workload per measurement: the collection/rollout hot loop — physics
``step`` bursts + full 5-texture ``render_all`` (the exact per-view cost of
``get_image``), on the open_cabinet task env.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(n_envs, n_threads, n_cycles=6, steps_per_cycle=30):
    os.environ["RGBMANIP_SIM_THREADS"] = str(n_threads)
    from rgbmanip_tpu.config import load_config
    from rgbmanip_tpu.train import prepare_env
    from rgbmanip_tpu.utils.logger import get_logger

    log = get_logger()
    log.setLevel("WARNING")
    cfg = load_config(["task=open_cabinet_no_dr", f"task.num_envs={n_envs}"])
    env = prepare_env(cfg["task"], cfg["dataset"], log=log, seed=0)
    try:
        env.reset()
        import numpy as np
        zero = np.zeros((n_envs, 9))
        # warmup one cycle
        env.pool.step_all(zero, n_substeps=steps_per_cycle)
        env.get_image()
        t0 = time.perf_counter()
        for _ in range(n_cycles):
            env.pool.step_all(zero, n_substeps=steps_per_cycle)
            env.get_image()
        dt = time.perf_counter() - t0
        env_steps = n_cycles * steps_per_cycle * n_envs
        renders = n_cycles * n_envs
        return {"n_envs": n_envs, "n_threads": n_threads,
                "wall_s": round(dt, 3),
                "env_steps_per_s": round(env_steps / dt, 1),
                "renders_per_s": round(renders / dt, 2)}
    finally:
        env.close()


def main():
    rows = []
    # 1. env-count scaling at 1 worker thread (serial baseline shape)
    for n in (1, 2, 4, 8, 16):
        rows.append(measure(n, 1))
        print(json.dumps(rows[-1]), flush=True)
    # 2. thread oversubscription at 8 envs on the 1-core host
    for t in (2, 4, 8):
        rows.append(measure(8, t))
        print(json.dumps(rows[-1]), flush=True)
    one = rows[0]["env_steps_per_s"]
    print("\nefficiency vs 1-env serial (env_steps/s per env / 1-env rate):")
    for r in rows[:5]:
        eff = r["env_steps_per_s"] / one
        print(f"  n_envs={r['n_envs']:3d}: total {r['env_steps_per_s']:8.1f} steps/s"
              f"  efficiency {eff:.3f}")
    base8 = rows[3]["env_steps_per_s"]
    print("oversubscription at n_envs=8 (vs 1 thread):")
    for r in rows[5:]:
        print(f"  threads={r['n_threads']}: {r['env_steps_per_s']:8.1f} steps/s"
              f"  ratio {r['env_steps_per_s'] / base8:.3f}")


if __name__ == "__main__":
    main()

#!/bin/bash
# Round-4 job chain: wait for the dagger3 estimator watcher to exit, run the
# PPO-iteration benchmark in the quiet gap, then launch the coadapt3 PPO
# burst and the fine-depth mug estimator retrain (concurrent: PPO rollouts
# are host-sim-bound, estimator steps are chip-bound — they overlap ~40%).
set -u
cd /root/repo

DAGGER_PID=$(cat /tmp/dagger3.pid 2>/dev/null || echo "")
if [ -n "$DAGGER_PID" ]; then
  while kill -0 "$DAGGER_PID" 2>/dev/null; do sleep 60; done
fi
echo "[chain] $(date -u) dagger3 watcher exited" >> /tmp/r4_chain.log

# quiet-gap benchmark: full PPO iteration throughput (BASELINE target 2)
timeout 2400 python scripts/bench_ppo_iter.py 64 3 > /tmp/ppo_iter_r4.log 2>&1
echo "[chain] $(date -u) bench_ppo_iter done rc=$?" >> /tmp/r4_chain.log

# coadapt3: continue PPO from coadapt2_205 with the dagger3 estimator
TAG=coadapt3 EST=checkpoints/estimator_fast_cabinet_dagger3_r4.ckpt \
SEED_CKPT=checkpoints/ppo_rl_coadapt2_model_205.ckpt \
nohup bash scripts/tunnel_watch_coadapt.sh 245 20 > /tmp/watch_coadapt3.out 2>&1 &
echo $! > /tmp/coadapt3.pid
echo "[chain] $(date -u) coadapt3 launched pid $(cat /tmp/coadapt3.pid)" >> /tmp/r4_chain.log

# mug estimator from scratch with 2x finer depth bins over the measured
# camera-handle band (0.35..1.63 m) + longer budget
# CHUNK=150: under coadapt3 contention the trainer can drop to ~0.1 it/s,
# and a 250-step chunk would exceed the watcher's TMOUT (250*5+1500 s) and
# be miscounted as a deterministic failure 3x -> bail. 150-step chunks stay
# inside TMOUT even at 0.1 it/s.
SUFFIX=_fine_r4 nohup bash scripts/tunnel_watch_estimator.sh mug 3000 150 \
  d_min=0.35 d_interval=0.08 > /tmp/watch_mug_fine.out 2>&1 &
echo $! > /tmp/mug_fine.pid
echo "[chain] $(date -u) mug_fine launched pid $(cat /tmp/mug_fine.pid)" >> /tmp/r4_chain.log

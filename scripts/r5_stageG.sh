#!/bin/bash
# Stage G: reference-direction no-DR ablation (VERDICT r4 item 6).
# The reference RETRAINS its stack without domain randomization
# (ablation_results.yaml:101-104 -> 66.625/73.0). Full-stack retrain does
# not fit the round, so the REDUCED, CLEARLY-LABELED protocol is:
#   - estimator retrained FROM SCRATCH on the no-DR task (2000 steps, the
#     same budget class as the production cabinet estimator's first
#     training round),
#   - camera-scheduler policy reused from the DR-trained flagship
#     (coadapt-165) — retraining PPO does not fit; labeled in RESULTS.md.
# Evaluated on open_cabinet_no_dr, both splits, default consensus fusion.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_stageG.log
POLICY=checkpoints/ppo_rl_coadapt_model_165.ckpt
EST=checkpoints/estimator_fast_cabinet_nodr_r5.ckpt

echo "[stageG] $(date -u) start" >> "$LOG"
SUFFIX=_nodr_r5 bash scripts/tunnel_watch_estimator.sh cabinet 2000 500 \
  task=open_cabinet_no_dr >> "$LOG" 2>&1
echo "[stageG] $(date -u) no-DR estimator done rc=$?" >> "$LOG"

for split in test train; do
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet_no_dr \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$EST" \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/r5_nodr_$split.log 2>&1
  echo "[stageG] $(date -u) no-DR eval $split rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_nodr_$split.log | tail -1)" >> "$LOG"
done
echo "[stageG] $(date -u) DONE" >> "$LOG"

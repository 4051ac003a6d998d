#!/bin/bash
# Stage E: drawer flagship (VERDICT r4 item 3; reference row 83/87).
#   1. zero-shot probe: the cabinet-trained camera scheduler (coadapt-165)
#      on open_drawer with the drawer estimator (obs/action spaces and
#      reward structure are shared across categories)
#   2. short co-adaptation fine-tune burst (165 -> 195) with the drawer
#      estimator in the loop
#   3. 104-ep evals on both splits
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_stageE.log
POLICY=checkpoints/ppo_rl_coadapt_model_165.ckpt
EST=checkpoints/estimator_fast_drawer_r3.ckpt

echo "[stageE] $(date -u) zero-shot probe" >> "$LOG"
timeout 2700 python train.py dataset=drawer_test task=open_drawer \
  manipulation=open_drawer controller=rl "controller.load=$POLICY" \
  pose_estimator=adapose_drawer_fast \
  "pose_estimator.checkpoint_path=$EST" \
  train=test train.total_round=104 task.num_envs=8 seed=11 \
  > /tmp/r5_drawer_zeroshot.log 2>&1
echo "[stageE] $(date -u) zeroshot rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_drawer_zeroshot.log | tail -1)" >> "$LOG"

if [ "${SKIP_FT:-0}" != "1" ]; then
  echo "[stageE] $(date -u) fine-tune burst 165->195" >> "$LOG"
  CAT=drawer TAG=drawer_rl EST=$EST SEED_CKPT=$POLICY \
    bash scripts/tunnel_watch_coadapt.sh 195 10 >> "$LOG" 2>&1
  FT=checkpoints/ppo_rl_drawer_rl_model_195.ckpt
  if [ -f "$FT" ]; then
    for split in test train; do
      timeout 2700 python train.py dataset=drawer_$split task=open_drawer \
        manipulation=open_drawer controller=rl "controller.load=$FT" \
        pose_estimator=adapose_drawer_fast \
        "pose_estimator.checkpoint_path=$EST" \
        train=test train.total_round=104 task.num_envs=8 seed=11 \
        > /tmp/r5_drawer_ft_$split.log 2>&1
      echo "[stageE] $(date -u) ft eval $split rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_drawer_ft_$split.log | tail -1)" >> "$LOG"
    done
  else
    echo "[stageE] $(date -u) fine-tune checkpoint missing" >> "$LOG"
  fi
fi
echo "[stageE] $(date -u) DONE" >> "$LOG"

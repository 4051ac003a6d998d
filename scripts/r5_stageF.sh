#!/bin/bash
# Stage F: task-variant learned-stack rows (VERDICT r4 missing-1 tail):
# open_cabinet_45 with the flagship RL+AdaPose stack (reference
# main_results.yaml:20-22 = 51.125/52.875) and, if the drawer fine-tune
# landed (stage E), open_drawer_30 (main_results.yaml:26-28 = 63.5/61.875).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_stageF.log
POLICY=${POLICY:-checkpoints/ppo_rl_coadapt_model_165.ckpt}
EST=${EST:?cabinet estimator checkpoint}

for split in test train; do
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet_45 \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$EST" \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/r5_cab45_$split.log 2>&1
  echo "[stageF] $(date -u) cab45 $split rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_cab45_$split.log | tail -1)" >> "$LOG"
done

DFT=checkpoints/ppo_rl_drawer_rl_model_195.ckpt
DEST=checkpoints/estimator_fast_drawer_r3.ckpt
if [ -f "$DFT" ] && [ "${SKIP_D30:-0}" != "1" ]; then
  for split in test train; do
    timeout 2700 python train.py dataset=drawer_$split task=open_drawer_30 \
      manipulation=open_drawer controller=rl "controller.load=$DFT" \
      pose_estimator=adapose_drawer_fast \
      "pose_estimator.checkpoint_path=$DEST" \
      train=test train.total_round=104 task.num_envs=8 seed=11 \
      > /tmp/r5_drawer30_$split.log 2>&1
    echo "[stageF] $(date -u) drawer30 $split rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_drawer30_$split.log | tail -1)" >> "$LOG"
  done
fi
echo "[stageF] $(date -u) DONE" >> "$LOG"

#!/bin/bash
# Round-5 chip chain (chip-serial; each stage waits for the previous):
#   1. wait for the fine-depth mug estimator (3000 steps, seeded from r3
#      weights) to finish
#   2. mug parity metrics + heuristic+AdaPose-fine eval on both splits
#      (VERDICT r5 item 1: beat reference full-system 48.4/41.9)
#   3. from-scratch cabinet estimator with STRONG VIEW AUGMENTATION
#      (view_aug=wide, 8000 steps — VERDICT item 2: recover the
#      reference-semantics k=4 row via estimator generalization)
# Stage-3 evals and the drawer flagship run interactively after this.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chain.log
MUG_EST=checkpoints/estimator_fast_mug_fine_r5.ckpt
MUG_KNOBS="pose_estimator.d_min=0.35 pose_estimator.d_interval=0.08"

MUG_PID=$(cat /tmp/mug_fine_r5.pid 2>/dev/null || echo "")
if [ -n "$MUG_PID" ]; then
  while kill -0 "$MUG_PID" 2>/dev/null; do sleep 30; done
fi
echo "[r5chain] $(date -u) mug training drained" >> "$LOG"

timeout 1500 python -m rgbmanip_tpu.models.pose_estimator.evaluate \
  task=pick_mug dataset=mug_test task.num_envs=8 \
  checkpoint=$MUG_EST rounds=13 img_size=192 backend=resnet18 \
  backbone_stride=32 volume_scale=8 n_depth=16 d_min=0.35 d_interval=0.08 \
  warp_mode=nearest > /tmp/mug_fine_r5_parity.log 2>&1
echo "[r5chain] $(date -u) mug parity rc=$?" >> "$LOG"

for split in test train; do
  timeout 2700 python train.py dataset=mug_$split task=pick_mug \
    manipulation=pick_mug controller=heuristic_pose \
    pose_estimator=adapose_mug_fast \
    "pose_estimator.checkpoint_path=$MUG_EST" $MUG_KNOBS \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/mug_fine_r5_eval_$split.log 2>&1
  echo "[r5chain] $(date -u) mug eval $split rc=$?" >> "$LOG"
done

# stage 3: from-scratch cabinet estimator, strong view augmentation
echo "[r5chain] $(date -u) launching cabinet aug training" >> "$LOG"
SUFFIX=_aug_r5 bash scripts/tunnel_watch_estimator.sh cabinet 8000 500 \
  view_aug=wide >> "$LOG" 2>&1
echo "[r5chain] $(date -u) cabinet aug training done rc=$?" >> "$LOG"

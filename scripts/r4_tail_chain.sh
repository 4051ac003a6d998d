#!/bin/bash
# Round-4 tail chain: after the flagship sweep drains the chip, measure
# (1) the fine-depth mug estimator's parity metrics, (2) the mug learned
# stack (heuristic + AdaPose-fine) on both splits — VERDICT r3 item 5:
# beat the reference full-system 48.4/41.9 (main_results.yaml:32-34) —
# and (3) the no-DR ablation rows (VERDICT item 8; reference
# ablation_results.yaml DomainRandomization Cabinet = 66.625/73.0; note
# the reference RETRAINS without DR, we measure the trained stack
# evaluated without DR — documented as such in RESULTS.md).
set -u
cd "$(dirname "$0")/.."
MUG_EST=checkpoints/estimator_fast_mug_fine_r4.ckpt
MUG_KNOBS="pose_estimator.d_min=0.35 pose_estimator.d_interval=0.08"
POLICY=checkpoints/ppo_rl_coadapt_model_165.ckpt
CAB_EST=checkpoints/estimator_fast_cabinet_dagger_r3.ckpt

SWEEP_PID=$(cat /tmp/flagship_sweep.pid 2>/dev/null || echo "")
if [ -n "$SWEEP_PID" ]; then
  while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
fi
echo "[tail] $(date -u) sweep drained" >> /tmp/r4_tail.log

timeout 1500 python -m rgbmanip_tpu.models.pose_estimator.evaluate \
  task=pick_mug dataset=mug_test task.num_envs=8 \
  checkpoint=$MUG_EST rounds=13 img_size=192 backend=resnet18 \
  backbone_stride=32 volume_scale=8 n_depth=16 d_min=0.35 d_interval=0.08 \
  warp_mode=nearest > /tmp/mug_fine_parity.log 2>&1
echo "[tail] $(date -u) mug parity rc=$?" >> /tmp/r4_tail.log

for split in test train; do
  timeout 2700 python train.py dataset=mug_$split task=pick_mug \
    manipulation=pick_mug controller=heuristic_pose \
    pose_estimator=adapose_mug_fast \
    "pose_estimator.checkpoint_path=$MUG_EST" $MUG_KNOBS \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/mug_fine_eval_$split.log 2>&1
  echo "[tail] $(date -u) mug eval $split rc=$?" >> /tmp/r4_tail.log
done

for split in test train; do
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet_no_dr \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$CAB_EST" train=test \
    train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/nodr_rl_$split.log 2>&1
  echo "[tail] $(date -u) no-DR rl $split rc=$?" >> /tmp/r4_tail.log
done

for split in test train; do
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet_no_dr \
    manipulation=open_cabinet controller=gt_pose pose_estimator=ground_truth \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/nodr_gt_$split.log 2>&1
  echo "[tail] $(date -u) no-DR gt $split rc=$?" >> /tmp/r4_tail.log
done
echo "[tail] $(date -u) ALL DONE" >> /tmp/r4_tail.log

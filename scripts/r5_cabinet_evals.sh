#!/bin/bash
# Stage D: cabinet flagship evals after the aug estimator lands.
#   EST=checkpoints/estimator_fast_cabinet_aug_r5.ckpt bash scripts/r5_cabinet_evals.sh
# Order: the reference-semantics k=4 rows first (VERDICT item 2 done-
# criterion >= ~80 test), then the fused rows with the r5 stereo-filter
# (item 4: fused k=3 >= 87 with k=4 >= 90 retained).
set -u
cd "$(dirname "$0")/.."
POLICY=${POLICY:-checkpoints/ppo_rl_coadapt_model_165.ckpt}
EST=${EST:?estimator checkpoint}
LOG=/tmp/r5_cab_evals.log

run() {  # run NAME SPLIT FUSION K
  local name=$1 split=$2 fusion=$3 k=$4
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$EST" \
    "controller.estimate_fusion=$fusion" "controller.early_stop=$k" \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/r5_cab_${name}.log 2>&1
  echo "[evals] $(date -u) $name rc=$? $(grep -o 'success_rate.*' /tmp/r5_cab_${name}.log | tail -1)" >> "$LOG"
}

run k4last_test  test  last      4
run k4last_train train last      4
run k4fused_test test  consensus 4
run k3fused_test test  consensus 3
run k4fused_train train consensus 4
echo "[evals] $(date -u) ALL DONE" >> "$LOG"

#!/bin/bash
# Flagship (RL + AdaPose) evaluation sweep at the reference's own operating
# point: k=4 views (the default, NO early_stop tuning) on both splits, then
# the ViewNum curve k=3,2,1 on the test split (reference ablation:
# miscs/experimental_results/ablation_results.yaml:51-64 rises monotonically
# 71.1 -> 87.0; reference flagship main row: main_results.yaml:17-19 =
# 89.25 train / 88.875 test).
#
# Usage: POLICY=checkpoints/ppo_rl_coadapt3_model_225.ckpt \
#        EST=checkpoints/estimator_fast_cabinet_dagger3_r4.ckpt \
#        bash scripts/flagship_sweep.sh [rounds]
set -u
cd "$(dirname "$0")/.."
ROUNDS=${1:-104}
POLICY=${POLICY:?policy ckpt}
EST=${EST:?estimator ckpt}
OUT=${OUT:-/tmp/flagship_sweep_r4.txt}

run() {  # run SPLIT K
  local split=$1 k=$2
  echo "=== split=$split k=$k policy=$POLICY est=$EST ===" >> "$OUT"
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    controller.early_stop=$k pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$EST" train=test \
    train.total_round=$ROUNDS task.num_envs=8 seed=11 2>&1 |
    grep -E "FINAL|error|Error" | tail -4 >> "$OUT"
}

run test 4
run train 4
run test 3
run test 2
run test 1
echo "=== sweep done $(date -u) ===" >> "$OUT"

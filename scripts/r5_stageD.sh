#!/bin/bash
# Stage D auto-chain: wait for the cabinet aug watcher to exit, snapshot,
# run the per-step-error diagnostic with the NEW estimator, then the three
# decisive test-split evals (k4 last / k4 fused / k3 fused). Train-split and
# drawer stages fire interactively after review.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_stageD.log
EST=checkpoints/estimator_fast_cabinet_aug_r5.ckpt
POLICY=checkpoints/ppo_rl_coadapt_model_165.ckpt

CHAIN_PID=$(cat /tmp/r5_chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
echo "[stageD] $(date -u) cabinet training drained" >> "$LOG"

EST_CKPT=$EST timeout 1500 python scripts/diag_flagship.py "$POLICY" 6 8 \
  > /tmp/r5_diag_aug.log 2>&1
echo "[stageD] $(date -u) diag rc=$?" >> "$LOG"

run() {
  local name=$1 split=$2 fusion=$3 k=$4
  timeout 2700 python train.py dataset=cabinet_$split task=open_cabinet \
    manipulation=open_cabinet controller=rl "controller.load=$POLICY" \
    pose_estimator=adapose_cabinet_fast \
    "pose_estimator.checkpoint_path=$EST" \
    "controller.estimate_fusion=$fusion" "controller.early_stop=$k" \
    train=test train.total_round=104 task.num_envs=8 seed=11 \
    > /tmp/r5_cab_${name}.log 2>&1
  echo "[stageD] $(date -u) $name rc=$? $(grep -o 'FINAL success rate.*' /tmp/r5_cab_${name}.log | tail -1)" >> "$LOG"
}

run k4last_test  test  last      4
run k4fused_test test  consensus 4
run k3fused_test test  consensus 3
echo "[stageD] $(date -u) DONE" >> "$LOG"

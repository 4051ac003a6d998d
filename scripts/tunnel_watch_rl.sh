#!/bin/bash
# Wait for the axon TPU tunnel to come back, then launch (or resume) the
# flagship RL+AdaPose chunked training.  The tunnel goes down for hours at a
# time; this keeps the chip busy the moment it returns.
set -u
LOG=/tmp/rl_adapose.log
echo "[watch] $(date -u) waiting for tunnel..." >> "$LOG"
while :; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1; then
    echo "[watch] $(date -u) tunnel up — starting RL chunked run" >> "$LOG"
    break
  fi
  sleep 120
done
exec bash scripts/train_rl_chunked.sh saves/ppo_rl_adapose 225 25 \
  dataset=cabinet_train task=open_cabinet manipulation=open_cabinet \
  controller=rl pose_estimator=adapose_cabinet_fast \
  pose_estimator.checkpoint_path=checkpoints/estimator_fast_cabinet_r2.ckpt \
  task.num_envs=16 seed=3 exp_name=rl_adapose >> "$LOG" 2>&1

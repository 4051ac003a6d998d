#!/bin/bash
# Co-adaptation round for the flagship: resume the trained RL camera
# scheduler (model_125) and continue PPO WITH the DAgger-finetuned
# estimator in the loop, so the policy re-adapts its view selection to
# the estimator it is evaluated with (and the estimator was itself
# fine-tuned on this policy's views — one DAgger/co-adaptation cycle).
# Snapshots each chunk's latest model into checkpoints/ (saves/ is wiped
# between sessions).
#
# Usage: scripts/tunnel_watch_coadapt.sh [TOTAL_ITERS] [CHUNK]
# CAT (env, default cabinet) selects the task family (cabinet|drawer):
# the flagship co-adaptation generalizes per-category by swapping the
# dataset/task/manipulation/estimator config group names.
set -u
TOTAL=${1:-165}
CHUNK=${2:-20}
CAT=${CAT:-cabinet}
case "$CAT" in
  cabinet) TASK=open_cabinet ;;
  drawer)  TASK=open_drawer ;;
  *) echo "unknown CAT $CAT" >&2; exit 2 ;;
esac
# Overridable for later bursts (e.g. burst 2: EST=dagger2 ckpt, SEED from
# model_165, TAG=coadapt2).
TAG=${TAG:-coadapt}
EST=${EST:-checkpoints/estimator_fast_cabinet_dagger_r3.ckpt}
SEED_CKPT=${SEED_CKPT:-checkpoints/ppo_rl_adapose_model_125.ckpt}
SAVE_DIR=saves/ppo_rl_${TAG}
LOG=/tmp/rl_${TAG}.log
mkdir -p "$SAVE_DIR"
# seed from the committed checkpoint if the dir is empty
if ! ls "$SAVE_DIR"/model_*.ckpt >/dev/null 2>&1; then
  IT=$(basename "$SEED_CKPT" | sed 's/.*model_\([0-9]*\)\.ckpt/\1/')
  cp "$SEED_CKPT" "$SAVE_DIR/model_${IT}.ckpt"
fi
snapshot() {
  LATEST=$(ls -t "$SAVE_DIR"/model_*.ckpt 2>/dev/null | head -1)
  if [ -n "$LATEST" ]; then
    IT=$(basename "$LATEST" | sed 's/model_\([0-9]*\)\.ckpt/\1/')
    cp "$LATEST" "checkpoints/ppo_rl_${TAG}_model_${IT}.ckpt.tmp" &&
      mv "checkpoints/ppo_rl_${TAG}_model_${IT}.ckpt.tmp" \
         "checkpoints/ppo_rl_${TAG}_model_${IT}.ckpt"
  fi
}
echo "[watch] $(date -u) waiting for tunnel (coadapt)..." >> "$LOG"
while :; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1; then break; fi
  sleep 60
done
( while :; do sleep 600; snapshot; done ) &
SIDECAR=$!
trap 'kill $SIDECAR 2>/dev/null' EXIT
bash scripts/train_rl_chunked.sh "$SAVE_DIR" "$TOTAL" "$CHUNK" \
  dataset=${CAT}_train task=$TASK manipulation=$TASK \
  controller=rl pose_estimator=adapose_${CAT}_fast \
  pose_estimator.checkpoint_path=$EST \
  task.num_envs=16 seed=3 exp_name=rl_${TAG} >> "$LOG" 2>&1
snapshot
echo "[watch] $(date -u) coadapt complete" >> "$LOG"

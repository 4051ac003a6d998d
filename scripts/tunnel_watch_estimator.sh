#!/bin/bash
# Wait for the axon TPU tunnel to come back, then launch (or resume) the
# chunked fast-estimator training and snapshot each chunk's checkpoint into
# the committed checkpoints/ directory (saves/ is wiped between sessions).
# Companion to tunnel_watch_rl.sh; same rationale.
#
# Usage: scripts/tunnel_watch_estimator.sh [TOTAL_STEPS]
set -u
TOTAL=${1:-4000}
LOG=/tmp/est_train.log
CKPT=saves/estimator_fast_cabinet_r2.ckpt
SNAP=checkpoints/estimator_fast_cabinet_r2.ckpt
mkdir -p saves checkpoints
# resume from the committed snapshot if the scratch ckpt was wiped
if [ ! -f "$CKPT" ] && [ -f "$SNAP" ]; then cp "$SNAP" "$CKPT"; fi
echo "[watch] $(date -u) waiting for tunnel..." >> "$LOG"
while :; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watch] $(date -u) tunnel up — starting estimator chunked run" >> "$LOG"
    break
  fi
  sleep 60
done
# sidecar: refresh the committed snapshot every 3 min (the trainer writes
# the scratch ckpt every 200 steps; chunk-end-only copies lose up to a full
# chunk if the session dies mid-chunk)
(
  while :; do
    sleep 180
    if [ -f "$CKPT" ] && [ "$CKPT" -nt "$SNAP" ]; then cp "$CKPT" "$SNAP"; fi
  done
) &
SIDECAR=$!
trap 'kill $SIDECAR 2>/dev/null' EXIT
DONE=0
while [ "$DONE" -lt "$TOTAL" ]; do
  echo "=== chunk: +1000 steps (done $DONE/$TOTAL) ===" >> "$LOG"
  timeout 3600 python -m rgbmanip_tpu.models.pose_estimator.train_estimator \
    steps=1000 resume="$CKPT" save="$CKPT" \
    dataset=cabinet_train task=open_cabinet task.num_envs=8 seed=7 \
    img_size=192 backend=resnet18 backbone_stride=32 volume_scale=8 \
    n_depth=16 d_interval=0.15 warp_mode=nearest >> "$LOG" 2>&1
  rc=$?
  if [ -f "$CKPT" ]; then cp "$CKPT" "$SNAP"; fi
  if [ "$rc" -ne 0 ]; then
    echo "[watch] $(date -u) chunk rc=$rc — re-waiting for tunnel" >> "$LOG"
    while :; do
      if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then break; fi
      sleep 60
    done
  else
    DONE=$((DONE + 1000))
  fi
done
echo "[watch] $(date -u) training complete at $DONE steps" >> "$LOG"

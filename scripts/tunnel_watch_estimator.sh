#!/bin/bash
# Wait for the axon TPU tunnel to come back, then launch (or resume) the
# chunked fast-estimator training for CATEGORY and snapshot each chunk's
# checkpoint into the committed checkpoints/ directory (saves/ is wiped
# between sessions). Companion to tunnel_watch_rl.sh; same rationale.
#
# Usage: scripts/tunnel_watch_estimator.sh CATEGORY [TOTAL_STEPS] [CHUNK] [extra trainer args...]
#   CATEGORY in {cabinet, drawer, pot, mug}
#   SUFFIX (env, default _r3) names the checkpoint pair saves/ + checkpoints/
#   INIT (env) seeds the scratch ckpt from an existing checkpoint when neither
#     the scratch nor the snapshot exists (e.g. DAgger fine-tune from the
#     collection-trained weights)
# Extra args after CHUNK go straight to train_estimator (e.g. controller=rl
# policy_ckpt=... policy_mix=0.5 for the DAgger pass).
set -u
CAT=${1:?category (cabinet|drawer|pot|mug)}
TOTAL=${2:-4000}
CHUNK=${3:-250}
shift 3 2>/dev/null || shift $#
EXTRA=("$@")
SUFFIX=${SUFFIX:-_r3}
case "$CAT" in
  cabinet) TASK=open_cabinet ;;
  drawer)  TASK=open_drawer ;;
  pot)     TASK=open_pot ;;
  mug)     TASK=pick_mug ;;
  *) echo "unknown category $CAT" >&2; exit 2 ;;
esac
LOG=/tmp/est_train_${CAT}${SUFFIX}.log
CKPT=saves/estimator_fast_${CAT}${SUFFIX}.ckpt
SNAP=checkpoints/estimator_fast_${CAT}${SUFFIX}.ckpt
mkdir -p saves checkpoints
# resume from the committed snapshot if the scratch ckpt was wiped
if [ ! -f "$CKPT" ] && [ -f "$SNAP" ]; then cp "$SNAP" "$CKPT"; fi
# seed a brand-new run from INIT (fine-tune), if given
if [ ! -f "$CKPT" ] && [ -n "${INIT:-}" ] && [ -f "${INIT:-}" ]; then cp "$INIT" "$CKPT"; fi
snapshot() {  # atomic: never leave $SNAP as a partial file [ADVICE r2]
  if [ -f "$CKPT" ] && { [ ! -f "$SNAP" ] || [ "$CKPT" -nt "$SNAP" ]; }; then
    cp "$CKPT" "$SNAP.tmp" && mv "$SNAP.tmp" "$SNAP"
  fi
}
echo "[watch] $(date -u) waiting for tunnel ($CAT)..." >> "$LOG"
while :; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1; then
    echo "[watch] $(date -u) tunnel up — starting $CAT estimator run" >> "$LOG"
    break
  fi
  sleep 60
done
# sidecar: refresh the committed snapshot every 3 min (the trainer writes
# the scratch ckpt every 200 steps; chunk-end-only copies lose up to a full
# chunk if the session dies mid-chunk)
( while :; do sleep 180; snapshot; done ) &
SIDECAR=$!
trap 'kill $SIDECAR 2>/dev/null' EXIT
DONE=0
FAILS=0   # consecutive failures WITH the tunnel up ⇒ deterministic error, bail [ADVICE r2]
# Chunk timeout must scale with CHUNK: under contention the trainer runs at
# ~0.3 it/s plus ~10 min first-compile, so a 1000-step chunk can exceed a
# fixed 3600s and be miscounted as a failure even though the checkpoint
# advanced the whole time.
TMOUT=$((CHUNK * 5 + 1500))
while [ "$DONE" -lt "$TOTAL" ]; do
  echo "=== chunk: +$CHUNK steps (done $DONE/$TOTAL) ===" >> "$LOG"
  MTIME_BEFORE=$(stat -c %Y "$CKPT" 2>/dev/null || echo 0)
  timeout $TMOUT python -m rgbmanip_tpu.models.pose_estimator.train_estimator \
    steps=$CHUNK resume="$CKPT" save="$CKPT" save_every=50 \
    dataset=${CAT}_train task=$TASK task.num_envs=8 seed=7 \
    img_size=192 backend=resnet18 backbone_stride=32 volume_scale=8 \
    n_depth=16 d_interval=0.15 warp_mode=nearest "${EXTRA[@]}" >> "$LOG" 2>&1
  rc=$?
  snapshot
  if [ "$rc" -ne 0 ]; then
    MTIME_AFTER=$(stat -c %Y "$CKPT" 2>/dev/null || echo 0)
    if [ "$MTIME_AFTER" -gt "$MTIME_BEFORE" ]; then
      # the chunk advanced the checkpoint before dying (e.g. a congested
      # tunnel crawling below the chunk timeout) — that is PROGRESS, not a
      # deterministic failure; training resumes from the saved steps
      FAILS=0
      echo "[watch] $(date -u) chunk rc=$rc but ckpt advanced — congested, continuing" >> "$LOG"
    elif timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1; then
      FAILS=$((FAILS + 1))
      echo "[watch] $(date -u) chunk rc=$rc with tunnel UP (fail $FAILS/3)" >> "$LOG"
      if [ "$FAILS" -ge 3 ]; then
        echo "[watch] $(date -u) 3 consecutive non-tunnel failures — bailing" >> "$LOG"
        exit 1
      fi
    else
      echo "[watch] $(date -u) chunk rc=$rc — tunnel down, re-waiting" >> "$LOG"
      while :; do
        if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >/dev/null 2>&1; then break; fi
        sleep 60
      done
    fi
  else
    FAILS=0
    DONE=$((DONE + CHUNK))
  fi
done
echo "[watch] $(date -u) $CAT training complete at $DONE steps" >> "$LOG"

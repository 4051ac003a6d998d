#!/bin/bash
# Chunked PPO training of the camera scheduler (same rationale as
# train_estimator_chunked.sh: the axon tunnel client retains one host input
# buffer per jitted execution, so long single-process runs leak; PPO resume
# parses the iteration from the checkpoint filename, reference ppo.py:131-136).
#
# Usage: scripts/train_rl_chunked.sh SAVE_DIR TOTAL_ITERS CHUNK [overrides...]
# Resumes from the highest model_{it}.ckpt in SAVE_DIR (if any).
set -e
SAVE_DIR=${1:?save dir}
TOTAL=${2:?total iterations}
CHUNK=${3:-25}
shift 3
mkdir -p "$SAVE_DIR"
while :; do
  LATEST=$(ls "$SAVE_DIR"/model_*.ckpt 2>/dev/null \
           | sed 's/.*model_\([0-9]*\)\.ckpt/\1 &/' | sort -n | tail -1)
  IT=$(echo "$LATEST" | cut -d' ' -f1)
  CKPT=$(echo "$LATEST" | cut -d' ' -f2-)
  IT=${IT:-0}
  if [ "$IT" -ge "$TOTAL" ]; then echo "=== done at iteration $IT ==="; break; fi
  N=$CHUNK
  if [ $((IT + N)) -gt "$TOTAL" ]; then N=$((TOTAL - IT)); fi
  echo "=== chunk: iterations $IT..$((IT + N)) of $TOTAL (resume ${CKPT:-none}) ==="
  LOAD=""
  if [ -n "$CKPT" ]; then LOAD="controller.load=$CKPT"; fi
  # launcher-owned dotted overrides go AFTER the caller's args: the config
  # loader applies overrides in order, and a trailing group selection like
  # controller=rl REPLACES the controller dict, silently dropping any
  # controller.* overrides that came before it
  python train.py train=controller "$@" "train.iterations_per_epoch=$N" \
    "controller.learn.save_dir=$SAVE_DIR" $LOAD
done

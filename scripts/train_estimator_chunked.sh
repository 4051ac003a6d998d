#!/bin/bash
# Chunked estimator training: the axon tunnel's PJRT client retains one host
# input buffer per jitted execution (~25 MB/step at the fast config's batch;
# verified with /tmp/leak_probe.py-style runs: exactly input-sized RSS growth
# per execution, unaffected by device_put+delete / jax.clear_caches / gc), so
# a long single-process run is OOM-killed around 5k steps on the 125 GB host.
# Run the trainer in bounded chunks, resuming from the shared checkpoint.
#
# Usage: scripts/train_estimator_chunked.sh CKPT TOTAL_STEPS CHUNK [extra args...]
set -e
CKPT=${1:?checkpoint path}
TOTAL=${2:?total steps}
CHUNK=${3:-1000}
shift 3
DONE=0
while [ "$DONE" -lt "$TOTAL" ]; do
  N=$CHUNK
  if [ $((DONE + N)) -gt "$TOTAL" ]; then N=$((TOTAL - DONE)); fi
  echo "=== chunk: steps $DONE..$((DONE + N)) of $TOTAL ==="
  python -m rgbmanip_tpu.models.pose_estimator.train_estimator \
    steps="$N" resume="$CKPT" save="$CKPT" "$@"
  DONE=$((DONE + N))
done

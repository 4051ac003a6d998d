#!/bin/bash
# Round-5 boot chain — fire FIRST THING at round-5 start so the chip cooks
# while the session works (r4 lesson: training jobs must start early and be
# DEAD before the end-of-round driver bench window; the persistent compile
# cache in .jax_cache/ makes repeat programs start in seconds).
#
# State entering round 5 (see docs/RESULTS.md r4 sections):
# - Flagship CLOSED at the default operating point via consensus fusion:
#   k=4 = 88.46 train / 90.38 test vs reference 89.25/88.875. ViewNum curve
#   monotone (2.88/73.08/76.92/90.38).
# - Open k=3 note: a stereo-only candidate filter in consensus_fuse
#   (exclude duplicated-view quasi-mono estimates) should recover k=3's
#   87.5 while keeping k=4's 90.4 — implement + re-measure k=3/k=4 if time.
# - Mug fine-depth estimator (d_min=0.35 d_interval=0.08) seeded r4;
#   continue to 3000 steps, then eval vs reference full-system 48.4/41.9.
# - Drawer flagship: zero-shot probe + short fine-tune from the FEATURED
#   cabinet policy (coadapt-165, cycle 1.5 — later cycles overfit).
set -u
cd "$(dirname "$0")/.."
POLICY=checkpoints/ppo_rl_coadapt_model_165.ckpt

# 1. Mug fine-depth estimator continuation (VERDICT r3 item 5).
SUFFIX=_fine_r4 nohup bash scripts/tunnel_watch_estimator.sh mug 3000 500 \
  d_min=0.35 d_interval=0.08 > /tmp/watch_mug_fine.out 2>&1 &
echo $! > /tmp/mug_fine.pid
echo "[r5boot] $(date -u) mug_fine launched pid $(cat /tmp/mug_fine.pid)" >> /tmp/r5_boot.log

# 2. Drawer zero-shot transfer probe: does the cabinet-trained camera
#    scheduler already schedule good drawer views? (obs/action spaces are
#    identical; reward structure shared.) If near the drawer heuristic row
#    (89.4/84.6), the drawer flagship needs only a short fine-tune burst.
#    Runs AFTER the mug trainer frees the chip — keep chip-serial: wait for
#    the mug watcher to finish or kill it first.
# timeout 2700 python train.py dataset=drawer_test task=open_drawer \
#   manipulation=open_drawer controller=rl "controller.load=$POLICY" \
#   pose_estimator=adapose_drawer_fast train=test train.total_round=104 \
#   task.num_envs=8 seed=11 > /tmp/drawer_zeroshot_test.log 2>&1

# 3. Drawer flagship fine-tune (VERDICT r3 item 6; reference row 83/87):
# CAT=drawer TAG=drawer_rl EST=checkpoints/estimator_fast_drawer_r3.ckpt \
# SEED_CKPT=$POLICY bash scripts/tunnel_watch_coadapt.sh 195 10

# 4. Mug eval once the fine estimator lands (heuristic + AdaPose-fine,
#    104 eps both splits, target >= 48.4/41.9):
# for split in test train; do
#   timeout 2700 python train.py dataset=mug_$split task=pick_mug \
#     manipulation=pick_mug controller=heuristic_pose \
#     pose_estimator=adapose_mug_fast \
#     pose_estimator.checkpoint_path=checkpoints/estimator_fast_mug_fine_r4.ckpt \
#     pose_estimator.d_min=0.35 pose_estimator.d_interval=0.08 \
#     train=test train.total_round=104 task.num_envs=8 seed=11
# done

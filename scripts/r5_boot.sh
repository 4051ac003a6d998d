#!/bin/bash
# Round-5 boot chain — fire FIRST THING at round-5 start so the chip cooks
# while the session works (the r4 lesson: training jobs must start early
# and be DEAD before the end-of-round driver bench window).
#
# 1. Zero-shot transfer probe: does the cabinet-trained camera scheduler
#    (coadapt3_225) already schedule good drawer views? (obs/action spaces
#    are identical; the reward structure is shared.) If the zero-shot row
#    is near the drawer heuristic row, the drawer flagship only needs a
#    short fine-tune burst, not 165 iters from scratch.
# 2. Drawer flagship fine-tune: PPO seeded from the cabinet policy, with
#    the drawer estimator in the loop (VERDICT r3 item 6; reference drawer
#    flagship row 83/87, main_results.yaml:23-25).
# 3. Mug fine-depth estimator continuation 900 -> 3000 steps (VERDICT r3
#    item 5; eval with scripts/r4_tail_chain.sh's mug block afterwards).
set -u
cd "$(dirname "$0")/.."
POLICY=checkpoints/ppo_rl_coadapt3_model_225.ckpt

timeout 2700 python train.py dataset=drawer_test task=open_drawer \
  manipulation=open_drawer controller=rl "controller.load=$POLICY" \
  pose_estimator=adapose_drawer_fast train=test train.total_round=104 \
  task.num_envs=8 seed=11 > /tmp/drawer_zeroshot_test.log 2>&1
echo "[r5boot] $(date -u) drawer zero-shot rc=$?" >> /tmp/r5_boot.log

CAT=drawer TAG=drawer_rl EST=checkpoints/estimator_fast_drawer_r3.ckpt \
SEED_CKPT=$POLICY \
nohup bash scripts/tunnel_watch_coadapt.sh 275 10 > /tmp/watch_drawer_rl.out 2>&1 &
echo $! > /tmp/drawer_rl.pid
echo "[r5boot] $(date -u) drawer_rl launched pid $(cat /tmp/drawer_rl.pid)" >> /tmp/r5_boot.log

SUFFIX=_fine_r4 nohup bash scripts/tunnel_watch_estimator.sh mug 3000 150 \
  d_min=0.35 d_interval=0.08 > /tmp/watch_mug_fine.out 2>&1 &
echo $! > /tmp/mug_fine.pid
echo "[r5boot] $(date -u) mug_fine launched pid $(cat /tmp/mug_fine.pid)" >> /tmp/r5_boot.log

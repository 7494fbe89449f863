#!/bin/bash
# Round-5 quality re-anchor (VERDICT r4 #1): every headline number
# re-measured under the unpad="crop" default, sequentially on the TPU.
# Logs land in /tmp/q5_*.log; results merge into BENCH_E2E.json.
set -x
cd /root/repo
python bench_e2e.py e2e          > /tmp/q5_e2e.log 2>&1
python bench_e2e.py e2e_dual     > /tmp/q5_dual.log 2>&1
BENCH_GT_WEIGHTS="iid18=/root/repo/.ablation_weights/w18_iid,breadth18=/root/repo/.ablation_weights/w18_breadth" \
  python bench_e2e.py gt_real    > /tmp/q5_gt.log 2>&1
echo DONE

#!/bin/bash
# Round-5 TPU measurement chain, sequential (one chip, one CPU core):
#   1. roofline sol (CPU FLOP counts -> % of peak; VERDICT r4 #3)
#   2. stage2_ab + corr_ab measured levers (VERDICT r4 #3)
#   3. the quality re-anchor under unpad=crop (VERDICT r4 #1/#4)
# Logs land in /tmp/q5_*.log; results merge into BENCH_E2E.json.
set -x
cd /root/repo
python bench_roofline.py sol       > /tmp/q5_sol.log 2>&1
python bench_roofline.py stage2_ab > /tmp/q5_s2ab.log 2>&1
python bench_roofline.py corr_ab   > /tmp/q5_corrab.log 2>&1
bash run_quality_r5.sh             > /tmp/q5_quality.log 2>&1
echo ALL_DONE

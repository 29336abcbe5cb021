#!/bin/bash
# Round-2d: final-jet bench remeasure, fixed fwdlap profile, QH overlap rerun.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2c.pid) 2>/dev/null; do sleep 30; done
python bench.py > /tmp/bench_final.log 2>&1
python bench.py >> /tmp/bench_final.log 2>&1
python scripts/profile_step.py --fast > /tmp/prof_final_fast.log 2>&1
python scripts/profile_step.py > /tmp/prof_final_full.log 2>&1
CKPT=$(ls -t runs/prod_qh_n6q16/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_overlap.npz > runs/prod_qh_overlap.out 2>&1
echo "QH_OVERLAP_EXIT=$?"

#!/bin/bash
# Round-2h: full analysis-surface sweep on the production nu=1/3 checkpoint
# (density, pair correlation, 1-RDM) — the reference's netobs estimator set.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2g.pid) 2>/dev/null; do sleep 30; done
CKPT=$(ls -t runs/prod_r2_fwdlap/ckpt_*.npz | head -1)
for est in density pair_corr one_rdm; do
  python -m deephall_tpu.observables.runner "$CKPT" --estimator $est --steps 50 \
    --out runs/prod_r2_$est.npz > runs/prod_r2_$est.out 2>&1
  echo "${est}_EXIT=$?"
done

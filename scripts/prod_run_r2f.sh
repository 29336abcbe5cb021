#!/bin/bash
# Round-2f: scale up the Laughlin family to N=10 (2Q = 3(N-1) = 27, nu=1/3):
# trained Psiformer + analytic Laughlin anchor + overlap.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2e.pid) 2>/dev/null; do sleep 30; done
python -m deephall_tpu.train \
  system.nspins=[10,0] system.flux=27 system.compute_l2=false \
  batch_size=3360 seed=47 \
  optim.iterations=15000 optim.block_size=10 \
  log.save_path=runs/prod_n10q27 log.save_step_interval=1000 \
  > runs/prod_n10q27.out 2>&1
echo "N10_EXIT=$?"
python -m deephall_tpu.train \
  system.nspins=[10,0] system.flux=27 \
  network.type=laughlin \
  optim.optimizer=none optim.iterations=2000 optim.block_size=10 \
  batch_size=3360 seed=10 \
  log.save_path=runs/laughlin_anchor_n10 log.save_step_interval=1000 \
  > runs/laughlin_anchor_n10.out 2>&1
echo "N10_ANCHOR_EXIT=$?"
CKPT=$(ls -t runs/prod_n10q27/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 60 \
  --out runs/prod_n10q27_overlap.npz > runs/prod_n10q27_overlap.out 2>&1
echo "N10_OVERLAP_EXIT=$?"

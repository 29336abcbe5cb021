#!/bin/bash
# Round-2 production physics pipeline (runs on the one real TPU chip).
set -x
cd /root/repo
# 1. Converged production run: N=6, 2Q=15 (nu=1/3), Coulomb, KFAC, batch 3360.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=15 \
  batch_size=3360 seed=42 \
  optim.iterations=20000 optim.block_size=10 \
  log.save_path=runs/prod_r2 log.save_step_interval=1000 \
  > runs/prod_r2.out 2>&1
echo "PROD_EXIT=$?"
# 2. Analytic-Laughlin inference anchor at the production config.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=15 \
  network.type=laughlin \
  optim.optimizer=none optim.iterations=2000 optim.block_size=10 \
  batch_size=3360 seed=7 \
  log.save_path=runs/laughlin_anchor_n6 log.save_step_interval=1000 \
  > runs/laughlin_anchor_n6.out 2>&1
echo "ANCHOR_EXIT=$?"
# 3. Laughlin overlap of the trained state.
CKPT=$(ls -t runs/prod_r2/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_r2_overlap.npz > runs/prod_r2_overlap.out 2>&1
echo "OVERLAP_EXIT=$?"

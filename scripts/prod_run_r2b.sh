#!/bin/bash
# Round-2b production physics: forward-Laplacian pipeline parity at scale, plus the
# quasihole excitation family (N=6, 2Q=16) that round-1/2a runs did not exercise.
set -x
cd /root/repo
# 1. Production run on the FAST pipeline (system.compute_l2=false -> forward-
#    Laplacian local energy). Must reproduce runs/prod_r2's converged physics
#    (E = 6.86847(13)); different pipeline, same estimator.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=15 system.compute_l2=false \
  batch_size=3360 seed=43 \
  optim.iterations=20000 optim.block_size=10 \
  log.save_path=runs/prod_r2_fwdlap log.save_step_interval=1000 \
  > runs/prod_r2_fwdlap.out 2>&1
echo "FWDLAP_EXIT=$?"
# 2. Laughlin overlap of the fwdlap-trained state.
CKPT=$(ls -t runs/prod_r2_fwdlap/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_r2_fwdlap_overlap.npz > runs/prod_r2_fwdlap_overlap.out 2>&1
echo "OVERLAP_EXIT=$?"
# 3. Quasihole family: train Psiformer at N=6, 2Q=16 (one Laughlin quasihole,
#    Q1=3) on the fast pipeline.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 system.compute_l2=false \
  batch_size=3360 seed=44 \
  optim.iterations=10000 optim.block_size=10 \
  log.save_path=runs/prod_qh_n6q16 log.save_step_interval=1000 \
  > runs/prod_qh_n6q16.out 2>&1
echo "QH_EXIT=$?"
# 4. Analytic quasihole-Laughlin inference anchor at the same config.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 \
  network.type=laughlin \
  optim.optimizer=none optim.iterations=2000 optim.block_size=10 \
  batch_size=3360 seed=8 \
  log.save_path=runs/laughlin_anchor_qh_n6q16 log.save_step_interval=1000 \
  > runs/laughlin_anchor_qh_n6q16.out 2>&1
echo "QH_ANCHOR_EXIT=$?"

#!/bin/bash
# Round-2j: final rotation extension (another 20k steps).
set -x
cd /root/repo
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 system.compute_l2=false \
  system.lz_penalty=1.0 system.lz_center=0.0 \
  batch_size=3360 seed=50 \
  optim.iterations=45000 optim.block_size=10 \
  log.restore_path=runs/prod_qh_rotate2 \
  log.save_path=runs/prod_qh_rotate3 log.save_step_interval=2000 \
  > runs/prod_qh_rotate3.out 2>&1
echo "ROTATE3_EXIT=$?"
CKPT=$(ls -t runs/prod_qh_rotate3/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_rotate3_overlap.npz > runs/prod_qh_rotate3_overlap.out 2>&1
echo "ROTATE3_OVERLAP_EXIT=$?"

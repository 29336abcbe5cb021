#!/bin/bash
# Round-2i: extend the sector-rotation run to 35k total steps for convergence.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2h.pid) 2>/dev/null; do sleep 30; done
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 system.compute_l2=false \
  system.lz_penalty=1.0 system.lz_center=0.0 \
  batch_size=3360 seed=49 \
  optim.iterations=35000 optim.block_size=10 \
  log.restore_path=runs/prod_qh_rotate \
  log.save_path=runs/prod_qh_rotate2 log.save_step_interval=2000 \
  > runs/prod_qh_rotate2.out 2>&1
echo "ROTATE2_EXIT=$?"
CKPT=$(ls -t runs/prod_qh_rotate2/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_rotate2_overlap.npz > runs/prod_qh_rotate2_overlap.out 2>&1
echo "ROTATE2_OVERLAP_EXIT=$?"

#!/bin/bash
# Round-2g: sector rotation — warm-start from the converged (unpinned) quasihole
# state and let the Lz penalty rotate it to the Lz=0 member of the degenerate
# L=3 band, instead of optimizing from scratch under a stiff penalty.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2f.pid) 2>/dev/null; do sleep 30; done
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 system.compute_l2=false \
  system.lz_penalty=1.0 system.lz_center=0.0 \
  batch_size=3360 seed=48 \
  optim.iterations=15000 optim.block_size=10 \
  log.restore_path=runs/prod_qh_n6q16 \
  log.save_path=runs/prod_qh_rotate log.save_step_interval=1000 \
  > runs/prod_qh_rotate.out 2>&1
echo "ROTATE_EXIT=$?"
CKPT=$(ls -t runs/prod_qh_rotate/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_rotate_overlap.npz > runs/prod_qh_rotate_overlap.out 2>&1
echo "ROTATE_OVERLAP_EXIT=$?"

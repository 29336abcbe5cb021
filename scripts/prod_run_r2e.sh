#!/bin/bash
# Round-2e: pin the quasihole into the Lz=0 sector with the Lz penalty
# (reference feature system.lz_penalty/lz_center), then measure the overlap
# against the analytic Lz=0 quasihole.
set -x
cd /root/repo
while kill -0 $(cat /tmp/prod_r2d.pid) 2>/dev/null; do sleep 30; done
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=16 system.compute_l2=false \
  system.lz_penalty=1.0 system.lz_center=0.0 \
  batch_size=3360 seed=46 \
  optim.iterations=10000 optim.block_size=10 \
  log.save_path=runs/prod_qh_lzpin log.save_step_interval=1000 \
  > runs/prod_qh_lzpin.out 2>&1
echo "LZPIN_EXIT=$?"
CKPT=$(ls -t runs/prod_qh_lzpin/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_lzpin_overlap.npz > runs/prod_qh_lzpin_overlap.out 2>&1
echo "LZPIN_OVERLAP_EXIT=$?"

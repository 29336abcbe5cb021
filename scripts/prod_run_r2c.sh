#!/bin/bash
# Round-2c: packed-jet bench remeasure, quasihole overlap, quasiparticle family,
# and a converged N=8 run. Chained after prod_run_r2b.sh.
set -x
cd /root/repo
# 0. Wait for r2b to finish (it owns the chip until then).
while kill -0 $(cat /tmp/prod_r2b.pid) 2>/dev/null; do sleep 30; done
# 1. Remeasure bench with the packed jet (fresh compile; run twice, keep log).
python bench.py > /tmp/bench_packed.log 2>&1
python bench.py >> /tmp/bench_packed.log 2>&1
# 2. Per-phase profile incl. the new logsumdet_jet probe.
python scripts/profile_step.py --fast > /tmp/prof_packed.log 2>&1
# 3. Laughlin-quasihole overlap of the trained N=6 2Q=16 state.
CKPT=$(ls -t runs/prod_qh_n6q16/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qh_overlap.npz > runs/prod_qh_overlap.out 2>&1
echo "QH_OVERLAP_EXIT=$?"
# 4. Quasiparticle family: N=6, 2Q=14 (Q1=2, N=2Q1+2), trained + analytic anchor.
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=14 system.compute_l2=false \
  batch_size=3360 seed=45 \
  optim.iterations=10000 optim.block_size=10 \
  log.save_path=runs/prod_qp_n6q14 log.save_step_interval=1000 \
  > runs/prod_qp_n6q14.out 2>&1
echo "QP_EXIT=$?"
python -m deephall_tpu.train \
  system.nspins=[6,0] system.flux=14 \
  network.type=laughlin \
  optim.optimizer=none optim.iterations=2000 optim.block_size=10 \
  batch_size=3360 seed=9 \
  log.save_path=runs/laughlin_anchor_qp_n6q14 log.save_step_interval=1000 \
  > runs/laughlin_anchor_qp_n6q14.out 2>&1
echo "QP_ANCHOR_EXIT=$?"
CKPT=$(ls -t runs/prod_qp_n6q14/ckpt_*.npz | head -1)
python -m deephall_tpu.observables.runner "$CKPT" --estimator overlap --steps 100 \
  --out runs/prod_qp_overlap.npz > runs/prod_qp_overlap.out 2>&1
echo "QP_OVERLAP_EXIT=$?"

#!/bin/bash
# Round-3 chip queue 3: nu=2/5 Jain analytic anchor (VERDICT item 7).
# Waits for the jet-LayerNorm A/B (scripts/perf_r3_ln.sh) to free the chip,
# then runs the two-Lambda-level Jain state by inference at the production
# nu=2/5 config (implementation-independent anchor: plain MC integral of a
# closed-form |psi|^2; exact oracle L^2 = 0), and finally measures the trained
# Psiformer's overlap with that state.
set -x
cd /root/repo
LN_PID=${1:?pid of perf_r3_ln.sh}
while kill -0 "$LN_PID" 2>/dev/null; do sleep 60; done
{
  echo "=== Jain nu=2/5 analytic anchor inference (N=8, 2Q=16) ==="
  timeout 7200 python -m deephall_tpu.train \
    system.nspins=[8,0] system.flux=16 network.type=laughlin \
    optim.optimizer=none optim.iterations=2000 optim.block_size=10 \
    batch_size=3360 seed=43 mcmc.burn_in=200 \
    log.save_path=runs/prod_jain25_anchor log.save_step_interval=100000
  echo "ANCHOR_EXIT=$?"
  echo "=== Trained nu=2/5 Psiformer overlap with the Jain state ==="
  CKPT=$(ls runs/prod_jain25b/ckpt_*.npz | sort | tail -1)
  timeout 7200 python -m deephall_tpu.observables.runner "$CKPT" \
    --estimator overlap --steps 60 --out runs/prod_jain25b_overlap.npz
  echo "OVERLAP_EXIT=$?"
} > runs/prod_jain25_anchor.out 2>&1
echo "JAIN_ANCHOR_DONE"

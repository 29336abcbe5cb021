#!/bin/bash
# Round-3 chip queue: profiler traces for the MFU roofline, then the nu=2/5
# convergence extension (VERDICT items 3 and 7). Sequential — one chip.
set -x
cd /root/repo
{
  echo "=== trace: lean (bm default) ==="
  timeout 2400 python scripts/capture_trace.py --out runs/trace_r3_lean --blocks 2
  echo "TRACE_LEAN_EXIT=$?"
  echo "=== trace: L2-every-step ==="
  timeout 2400 python scripts/capture_trace.py --out runs/trace_r3_l2 --l2 --blocks 2
  echo "TRACE_L2_EXIT=$?"
} > runs/trace_r3.log 2>&1

# nu=2/5 N=8 2Q=16 extension: 20k -> 40k total steps (still descending at 20k).
python -m deephall_tpu.train \
  system.nspins=[8,0] system.flux=16 \
  batch_size=3360 seed=42 \
  optim.iterations=40000 optim.block_size=10 \
  log.restore_path=runs/prod_jain25 \
  log.save_path=runs/prod_jain25b log.save_step_interval=2000 \
  > runs/prod_jain25b.out 2>&1
echo "JAIN25B_EXIT=$?"
echo "R3_QUEUE_DONE"

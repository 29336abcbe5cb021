#!/bin/bash
# Round-3 perf A/B on the real chip: jet attention/tower layout variants.
# Each variant needs a fresh compile (5-20 min via the remote compile service);
# run sequentially in the background and inspect runs/perf_r3.log afterwards.
set -x
cd /root/repo
{
  echo "=== bm attention (new default) ==="
  python bench.py
  echo "=== vpu attention (round-2 behaviour) ==="
  DEEPHALL_JET_ATTENTION_IMPL=vpu python bench.py
  echo "=== full batch-minor tower ==="
  DEEPHALL_JET_TOWER_IMPL=fullbm python bench.py
  echo "=== per-phase (bm default, lean) ==="
  python scripts/profile_step.py --fast
  echo "=== per-phase (bm default, L2 mode) ==="
  python scripts/profile_step.py
  echo "=== per-phase (fullbm, lean) ==="
  DEEPHALL_JET_TOWER_IMPL=fullbm python scripts/profile_step.py --fast
} > runs/perf_r3.log 2>&1
echo "PERF_R3_DONE"

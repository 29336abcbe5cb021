#!/bin/bash
# Round-3 chip queue 2: fused jet-LayerNorm A/B (ops/jet_layernorm.py).
# Waits for the nu=2/5 extension to free the chip, then measures the control
# (chain LN, compile cached) and the fused kernel (fresh compile, 5-20 min).
set -x
cd /root/repo
JAIN_PID=${1:-18576}
while kill -0 "$JAIN_PID" 2>/dev/null; do sleep 60; done
{
  echo "=== control: chain LN (current default) ==="
  timeout 3600 python bench.py
  echo "CONTROL_EXIT=$?"
  echo "=== fused jet-LayerNorm (+ folded residual) ==="
  DEEPHALL_JET_LAYERNORM_IMPL=fused timeout 5400 python bench.py
  echo "FUSED_EXIT=$?"
} > runs/perf_r3_ln.log 2>&1
echo "PERF_R3_LN_DONE"

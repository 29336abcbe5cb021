"""Capture a jax.profiler trace of steady-state fused production blocks.

Builds the same fused iteration block as ``bench.py`` (N=6, 2Q=15, batch 3360,
KFAC, 10 MCMC steps/iter), warms up through the compile, then traces a few
blocks. The trace lands in ``--out`` as TensorBoard ``*.xplane.pb`` files;
summarise with ``scripts/trace_summary.py``.

    python scripts/capture_trace.py --out runs/trace_r3 [--l2] [--blocks 2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--l2", action="store_true", help="L2-every-step mode")
    parser.add_argument("--blocks", type=int, default=2)
    args = parser.parse_args()

    from bench import BLOCK, build_production_block
    from deephall_tpu.utils import setup_runtime

    setup_runtime()
    _, block, state, key, pmoves, t = build_production_block(args.l2)

    for _ in range(2):  # compile both input-sharding signatures
        state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
    float(jax.device_get(outs[0]["energy"].real[-1]))

    jax.profiler.start_trace(args.out)
    for _ in range(args.blocks):
        state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
    float(jax.device_get(outs[0]["energy"].real[-1]))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} ({args.blocks} blocks of {BLOCK})")


if __name__ == "__main__":
    main()

"""XLA cost-analysis FLOP count of the production fused block (CPU lowering).

Builds the same fused iteration block as ``bench.py`` / ``scripts/capture_trace.py``
(N=6, 2Q=15, batch 3360, KFAC, 10 MCMC steps/iter) on the CPU backend and prints
XLA's analytical FLOP/byte estimates per VMC iteration. Used together with the
device-time trace (``scripts/trace_summary.py``) to compute a measured MFU:
the arithmetic is identical on every backend, so the CPU count is the TPU count.

    JAX_PLATFORMS=cpu python scripts/flops_count.py [--l2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--l2", action="store_true", help="L2-every-step mode")
    parser.add_argument(
        "--block",
        type=int,
        default=None,
        help="override block size (run with two values to check whether XLA's "
        "cost analysis multiplies the scan body by its trip count)",
    )
    args = parser.parse_args()

    from bench import BLOCK as BENCH_BLOCK, build_production_block

    BLOCK = args.block or BENCH_BLOCK
    _, block, state, key, pmoves, t = build_production_block(
        args.l2, block_size=BLOCK
    )

    lowered = jax.jit(block, static_argnums=(4,)).lower(
        state, key, pmoves, t, BLOCK
    )
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_accessed = cost.get("bytes accessed", float("nan"))
    mode = "l2" if args.l2 else "lean"
    # XLA's cost analysis counts a lax.scan body ONCE regardless of trip count
    # (verified: identical totals at --block 1 and --block 2), so the analyzed
    # total IS the per-iteration figure at any block size.
    print(
        f"mode={mode} block={BLOCK} flops/iter={flops:.4g} "
        f"bytes/iter={bytes_accessed:.4g} "
        f"(scan body counted once by cost_analysis)"
    )


if __name__ == "__main__":
    main()

"""Robust tail statistics for a training run's ``train_stats.csv``.

Implements the BASELINE.md methodology: take the last ``--tail`` rows, drop
node-crossing spikes (rows outside a ``--window`` band around the tail median —
the raw per-step statistic keeps the *unclipped* local-energy mean, so isolated
spikes are sampling artifacts, not physics), then report the filtered mean with
a blocked error bar (``--blocks`` block means of the decorrelated series).

Usage:
    python scripts/tail_stats.py runs/prod_jain25b --tail 5000 [--col energy]
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np


def tail_stats(
    run_dir: str,
    tail: int = 5000,
    col: str = "energy",
    window: float = 0.05,
    blocks: int = 50,
) -> dict:
    """Compute robust tail statistics for one column of ``train_stats.csv``."""
    path = Path(run_dir)
    if path.is_dir():
        path = path / "train_stats.csv"
    with open(path) as f:
        rows = list(csv.DictReader(f))
    rows = rows[-tail:]
    values = np.array([float(r[col]) for r in rows])
    values = values[np.isfinite(values)]  # spike rows can log NaN observables
    if values.size == 0:
        raise ValueError(f"no finite values in column {col!r} of {path}")
    median = np.median(values)
    keep = np.abs(values - median) <= window
    kept = values[keep]
    if kept.size == 0:
        raise ValueError(
            f"--window {window} around the median {median:.5g} keeps no rows; "
            f"widen it (column {col!r} spans "
            f"[{values.min():.5g}, {values.max():.5g}])"
        )
    # Fewer rows than blocks would produce empty splits (NaN block means).
    blocks = max(2, min(blocks, kept.size))
    block_means = [b.mean() for b in np.array_split(kept, blocks)]
    return {
        "col": col,
        "rows": len(values),
        "kept": int(keep.sum()),
        "median": float(median),
        "mean": float(kept.mean()),
        "stderr": float(np.std(block_means, ddof=1) / np.sqrt(len(block_means))),
        "last_step": rows[-1]["step"],
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir")
    parser.add_argument("--tail", type=int, default=5000)
    parser.add_argument("--col", default="energy")
    parser.add_argument("--window", type=float, default=0.05)
    parser.add_argument("--blocks", type=int, default=50)
    args = parser.parse_args()
    s = tail_stats(args.run_dir, args.tail, args.col, args.window, args.blocks)
    print(
        f"{s['col']}: {s['mean']:.5f} +- {s['stderr']:.5f} "
        f"(median {s['median']:.5f}, kept {s['kept']}/{s['rows']}, "
        f"last step {s['last_step']})"
    )


if __name__ == "__main__":
    main()

"""Summarise a jax.profiler trace: top device ops by total time.

Parses the TensorBoard ``*.xplane.pb`` files written by
``scripts/capture_trace.py`` (or the training driver's ``log.profile_dir``
hooks) with the XSpace protobuf shipped inside this image's tensorflow, and
aggregates per-op durations on the device plane(s).

    python scripts/trace_summary.py runs/trace_r3 [--top 25] [--iters 20]
"""

from __future__ import annotations

import argparse
import collections
import glob
import re


def load_xspaces(root: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {root}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


# Rough functional-unit attribution by HLO opcode family.
CATEGORY_PATTERNS = [
    (re.compile(r"^(fusion|loop_fusion|input_fusion|output_fusion)"), "fusion"),
    (re.compile(r"^(dot|convolution|cublas|custom-call.*gemm)"), "matmul"),
    (re.compile(r"^(copy|transpose|bitcast|reshape)"), "copy/layout"),
    (re.compile(r"^(all-reduce|all-gather|reduce-scatter|collective)"), "collective"),
    (re.compile(r"^(dynamic-update-slice|dynamic-slice|gather|scatter)"), "slice"),
    (re.compile(r"^(reduce|convert|select|broadcast|iota|compare|add|multiply)"), "vpu"),
]


def categorise(name: str) -> str:
    for pat, cat in CATEGORY_PATTERNS:
        if pat.match(name):
            return cat
    return "other"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("root")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument(
        "--iters",
        type=int,
        default=None,
        help="divide totals by this many VMC iterations for a ms/iter column",
    )
    args = parser.parse_args()

    op_time: collections.Counter = collections.Counter()
    op_count: collections.Counter = collections.Counter()
    plane_names = []
    for _, xs in load_xspaces(args.root):
        for plane in xs.planes:
            # Device planes are named like "/device:TPU:0" or "TPU:0"; skip host
            # threads — python/runtime lines would double-count device work.
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            plane_names.append(plane.name)
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    op_time[name] += ev.duration_ps / 1e9  # -> ms
                    op_count[name] += 1

    total = sum(op_time.values())
    print(f"planes: {sorted(set(plane_names))}")
    print(f"total device op time: {total:.1f} ms")
    if args.iters:
        print(f"per iteration ({args.iters} iters): {total / args.iters:.2f} ms")
    cat_time: collections.Counter = collections.Counter()
    for name, t in op_time.items():
        cat_time[categorise(name)] += t
    print("\nby category:")
    for cat, t in cat_time.most_common():
        print(f"  {cat:12s} {t:10.1f} ms  {100 * t / total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    header = f"{'ms total':>10s} {'ms/iter':>8s} {'count':>6s}  name"
    print(header)
    for name, t in op_time.most_common(args.top):
        per = f"{t / args.iters:8.3f}" if args.iters else " " * 8
        print(f"{t:10.2f} {per} {op_count[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()

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


# Rough functional-unit attribution by HLO op / fusion-kind name. XLA names
# fusions after their root or most expensive op ("convolution_bitcast_fusion",
# "multiply_reduce_fusion", "broadcast_subtract_fusion", ...), so substring
# checks on the op name give a usable MXU-vs-VPU split.
def categorise(name: str) -> str:
    if "convolution" in name or re.search(r"\bdot\b|gemm", name):
        return "matmul (MXU)"
    if "copy" in name or "transpose" in name or "reshape" in name or "bitcast" in name:
        return "copy/layout"
    if "all-reduce" in name or "all-gather" in name or "reduce-scatter" in name:
        return "collective"
    if "slice" in name or "gather" in name or "scatter" in name:
        return "slice"
    if "fusion" in name or any(
        k in name
        for k in ("multiply", "add", "subtract", "reduce", "exp", "rsqrt", "select",
                  "broadcast", "compare", "divide", "maximum", "tanh", "log")
    ):
        return "vpu/elementwise"
    return "other"


def op_name(full: str) -> str:
    """Extract the bare op name from an HLO event label like '%fusion.8319 = ...'."""
    m = re.match(r"%?([\w.-]+)", full)
    base = m.group(1) if m else full
    return re.sub(r"\.\d+$", "", base)


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
    async_time = 0.0
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
                # "XLA Ops" is the exclusive sync-op timeline; "XLA Modules"/
                # "Steps" are enclosing aggregates and "Async XLA Ops" carries
                # DMA (copy/slice-start) that overlaps compute — summing either
                # with the op line would double count.
                if line.name == "Async XLA Ops":
                    async_time += sum(ev.duration_ps / 1e9 for ev in line.events)
                    continue
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    # while/conditional events enclose their body ops, which
                    # appear on the same line — skip the aggregates.
                    if op_name(name).startswith(("while", "conditional")):
                        continue
                    op_time[name] += ev.duration_ps / 1e9  # -> ms
                    op_count[name] += 1

    total = sum(op_time.values())
    print(f"planes: {sorted(set(plane_names))}")
    print(f"total sync op time: {total:.1f} ms (overlapped async DMA: {async_time:.1f} ms)")
    if args.iters:
        print(f"per iteration ({args.iters} iters): {total / args.iters:.2f} ms")
    cat_time: collections.Counter = collections.Counter()
    for name, t in op_time.items():
        cat_time[categorise(op_name(name))] += t
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

"""Microbenchmark the jet-attention lowerings on the TPU at production shapes.

Compares the primitive-chain lowerings (``vpu``, ``bm``) against the fused
Pallas kernel (``pallas``; contraction variant picked by
``DEEPHALL_JET_ATTN_CONTRACT``) on one attention layer at the production
configuration (batch 3360, T=6, D=256, H=4, lean and L² jet channel counts).

Standalone numbers are a first-order signal only — the decision metric stays
``bench.py`` on the full fused block (PERF_NOTES.md "Measurement pitfalls").

Usage: python scripts/bench_jet_attention.py [impl ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np
from jax import numpy as jnp

from deephall_tpu import utils
from deephall_tpu.networks import fwdlap as nets_fwdlap
from deephall_tpu.ops import jet_attention
from deephall_tpu.ops.fwdlap import Jet

BATCH, T, D, H = 3360, 6, 256, 4
SHAPES = {"lean": (13, 1), "l2": (15, 3)}
REPEATS = 30


def make_inputs(channels, extras):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    t = Jet(
        jax.random.normal(ks[0], (BATCH, T, D)),
        jax.random.normal(ks[1], (channels, BATCH, T, D)),
        jax.random.normal(ks[2], (BATCH, T, D)),
        jax.random.normal(ks[3], (extras, BATCH, T, D)),
    )
    hd = D // H
    p = {}
    for i, name in enumerate(("query", "key", "value")):
        p[name] = {
            "kernel": jax.random.normal(ks[4 + 2 * i], (D, H, hd)) / np.sqrt(D),
            "bias": jax.random.normal(ks[5 + 2 * i], (H, hd)) * 0.1,
        }
    p["out"] = {
        "kernel": jax.random.normal(ks[10], (H, hd, D)) / np.sqrt(D),
        "bias": jax.random.normal(ks[11], (D,)) * 0.1,
    }
    return p, t


def run_impl(impl, p, t):
    saved = nets_fwdlap.JET_ATTENTION_IMPL
    nets_fwdlap.JET_ATTENTION_IMPL = impl

    @jax.jit
    def step(t):
        out = nets_fwdlap._attention(p, H, t)
        # dependent scalar so the final readback syncs the whole chain
        return jnp.sum(out.l) + jnp.sum(out.x)

    try:
        step(t).block_until_ready()  # compile
        start = time.perf_counter()
        acc = None
        for _ in range(REPEATS):
            acc = step(t)
        _ = float(jax.device_get(acc))
        elapsed = (time.perf_counter() - start) / REPEATS
    finally:
        nets_fwdlap.JET_ATTENTION_IMPL = saved
    return elapsed * 1e3


def main():
    utils.enable_compilation_cache()
    impls = sys.argv[1:] or ["vpu", "bm", "pallas"]
    print(f"devices: {jax.devices()}  contract={jet_attention.CONTRACT_IMPL}")
    for mode, (channels, extras) in SHAPES.items():
        p, t = make_inputs(channels, extras)
        for impl in impls:
            if impl == "pallas" and not jet_attention.supported(t):
                print(f"{mode:5s} {impl:7s} unsupported shape, skipped")
                continue
            ms = run_impl(impl, p, t)
            print(f"{mode:5s} {impl:7s} {ms:8.3f} ms/layer")


if __name__ == "__main__":
    main()

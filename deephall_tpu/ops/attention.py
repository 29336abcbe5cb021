"""EXPERIMENTAL: fused Pallas attention core for tiny token counts.

Status (measured on TPU v5 lite, B=3360, T=6, H=4, D=64): **correct but 13x slower
than the jnp broadcast-multiply-reduce lowering** (23.8 ms vs 1.8 ms) — XLA already
fuses the tiny-token softmax chain on the VPU without HBM round trips, and this
kernel's unrolled per-(t,h,s) slice indexing generates poor Mosaic code.  It is NOT
wired into the network; it is kept as the starting point for round-2 kernel work
(per-(t,h) 2-D blocks and double-buffered DMA are the obvious next steps) and as a
record that the "always write a custom kernel" instinct loses to XLA fusion at
these shapes.  See PERF_NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, tokens: int, heads: int):
    """One grid step: refs are [T, H, D, Bt] blocks in VMEM."""
    for t in range(tokens):
        for h in range(heads):
            # logits over source tokens: list of [Bt] vectors
            logits = [
                jnp.sum(q_ref[t, h] * k_ref[s, h], axis=0) for s in range(tokens)
            ]
            m = logits[0]
            for s in range(1, tokens):
                m = jnp.maximum(m, logits[s])
            exps = [jnp.exp(l - m) for l in logits]
            denom = exps[0]
            for s in range(1, tokens):
                denom = denom + exps[s]
            inv = 1.0 / denom
            acc = exps[0][None, :] * v_ref[0, h]
            for s in range(1, tokens):
                acc = acc + exps[s][None, :] * v_ref[s, h]
            o_ref[t, h] = acc * inv[None, :]


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T / 1) v with fused VMEM-resident math.

    Args:
        q, k, v: ``[B, T, H, D]`` float32 (q already scaled by 1/sqrt(D)).

    Returns:
        ``[B, T, H, D]`` attention output.
    """
    b, t, h, d = q.shape
    # 128 walkers fill the lanes exactly; blocks stay well under the VMEM budget
    # (4 buffers x T*H*D*128 floats ~ 3 MB with double buffering).
    tile = min(128, b)
    padded = -(-b // tile) * tile
    if padded != b:
        pad = [(0, padded - b), (0, 0), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qt = jnp.moveaxis(q, 0, -1)  # [T, H, D, B]
    kt = jnp.moveaxis(k, 0, -1)
    vt = jnp.moveaxis(v, 0, -1)

    kernel = functools.partial(_attention_kernel, tokens=t, heads=h)
    out = pl.pallas_call(
        kernel,
        grid=(padded // tile,),
        in_specs=[
            pl.BlockSpec((t, h, d, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h, d, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h, d, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, h, d, tile), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, h, d, padded), q.dtype),
    )(qt, kt, vt)
    return jnp.moveaxis(out, -1, 0)[:b]

"""Fused scaled-dot-product attention over a forward-Laplacian jet (Pallas TPU).

The jet attention assembled from :mod:`deephall_tpu.ops.fwdlap` primitives —
q/k/v jet projections, the softmax chain, the value contraction and the output
projection — is the largest remaining block of the training step after the
fused jet LayerNorm: the round-3 profiler trace attributes ~17 ms of the ~90 ms
iteration to the attention region, most of it HBM traffic (batch-minor
relayouts around the softmax chain, three reads of the same input jet by the
q/k/v projections) rather than arithmetic (PERF_NOTES.md, "Measured roofline").

This kernel runs the *entire* jet attention for a block of walkers in one
VMEM-resident pass: the input jet block is read from HBM exactly once, the
q/k/v projections are three MXU matmuls over all jet channels at once
(``(P*W*T, D) @ (D, D)`` rows with P ~ 16-20 channel planes), the
``[T, S, H]`` logits/softmax/value chain never touches HBM, and the output jet
block is written exactly once.  HBM traffic per layer drops from ~10 passes
over the jet activation to the 2 unavoidable ones.

The jet algebra is identical to the primitive composition (product rule with a
cross term over the K Laplacian tangent channels, pointwise second-derivative
rule for exp/reciprocal; see ``ops/fwdlap.py``) and is pinned against it by
``tests/test_jet_attention.py``.  Matmuls run at ``HIGHEST`` precision — the
local-energy invariant (CLAUDE.md) applies to everything in this pipeline.

The reference computes attention through flax and ``jax.hessian`` sweeps
(``/root/reference/deephall/networks/psiformer.py:44``); this fusion has no
reference counterpart — it exists because the TPU jet tower is HBM-bound.
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
from jax import lax
from jax import numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deephall_tpu.ops.fwdlap import Jet

# Walker-block candidates. Everything for a block is VMEM-resident; at
# production shapes (T=6, D=256, 20 channel planes) W=16 keeps the working set
# within the raised VMEM budget below while giving (P*W*T ~ 1920)-row matmuls.
_WALKER_BLOCKS = (16, 8, 4)

# All jet channels of q/k/v/attn for the block live in VMEM at once; raise the
# scoped limit from the 16 MB default (v5e has 128 MB physical VMEM).
_VMEM_LIMIT = 100 * 1024 * 1024


def _dot(a, b):
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST)


# In-kernel lowering of the tiny per-head contractions (T=S=6, dh=64): "mxu"
# uses single-batch-dim tpu.matmul (Mosaic supports at most one batch dim,
# leading axes collapsed); "vpu" uses broadcast-multiply-reduce, which round-1
# measurements found faster for these shapes *outside* Pallas.  A/B-able.
CONTRACT_IMPL = os.environ.get("DEEPHALL_JET_ATTN_CONTRACT", "mxu")


def _bmm_qk(a, b):
    """``[*lead, T, dh] x [*lead, S, dh] -> [*lead, T, S]``."""
    if CONTRACT_IMPL == "vpu":
        return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)
    lead = a.shape[:-2]
    out = lax.dot_general(
        a.reshape((-1,) + a.shape[-2:]),
        b.reshape((-1,) + b.shape[-2:]),
        (((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (a.shape[-2], b.shape[-2]))


def _bmm_wv(a, b):
    """``[*lead, T, S] x [*lead, S, dh] -> [*lead, T, dh]`` (single batch dim)."""
    if CONTRACT_IMPL == "vpu":
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    lead = a.shape[:-2]
    out = lax.dot_general(
        a.reshape((-1,) + a.shape[-2:]),
        b.reshape((-1,) + b.shape[-2:]),
        (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (a.shape[-2], b.shape[-1]))


def _kernel(
    x_ref, j_ref, l_ref, d_ref,
    wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref, bv_ref, bo_ref,
    ox_ref, oj_ref, ol_ref, od_ref,
    *, num_heads: int,
):
    c = j_ref.shape[0]
    e = d_ref.shape[0]
    lap = c - e
    p = c + e + 2
    w, t, feat = x_ref.shape
    head_dim = feat // num_heads

    # Stack planes: [P, W, T, D] with plane order (x, j[0..C-1], l, d[0..E-1]).
    a = jnp.concatenate(
        [x_ref[...][None], j_ref[...], l_ref[...][None], d_ref[...]], axis=0
    )
    rows = a.reshape(p * w * t, feat)

    # Jet linear maps: one matmul over every channel plane.  Bias on x only —
    # folded back into plane 0 per head below (Mosaic has no scatter-add to
    # write it into the stacked tensor).  The 1/sqrt(head_dim) query scale is
    # folded into wq by the caller.
    rows_q = _dot(rows, wq_ref[...])
    rows_k = _dot(rows, wk_ref[...])
    rows_v = _dot(rows, wv_ref[...])

    # Per-head unrolled loop: inside one head every contraction is a
    # plane-stacked batched matmul with a single (collapsed) batch dimension,
    # which is all Mosaic's tpu.matmul supports.  The jet product rule for a
    # bilinear op f(q, k) needs three matmul families per contraction site:
    # every-plane x primal (A), primal x every-plane (B) and the channel
    # diagonal (qj[c]·kj[c]) that feeds the Laplacian/extra cross terms.
    head_outs = []
    for h in range(num_heads):
        sl_h = slice(h * head_dim, (h + 1) * head_dim)

        def head_planes(rows_o, b_ref):
            z = rows_o[:, sl_h].reshape(p, w, t, head_dim)
            x0 = z[0] + b_ref[...].reshape(feat)[sl_h]
            return x0, jnp.concatenate([x0[None], z[1:]], axis=0)

        qx, qs = head_planes(rows_q, bq_ref)
        kx, ks = head_planes(rows_k, bk_ref)
        vx, vs = head_planes(rows_v, bv_ref)

        def bcast(x0):
            return jnp.broadcast_to(x0[None], (p,) + x0.shape)

        # --- logits jet: [P,W,T,dh] x [P,W,S,dh] -> [P,W,T,S]
        qk_a = _bmm_qk(qs, bcast(kx))
        qk_b = _bmm_qk(bcast(qx), ks)
        qk_diag = _bmm_qk(qs[1 : 1 + c], ks[1 : 1 + c])
        gx = qk_a[0]
        gj = qk_a[1 : 1 + c] + qk_b[1 : 1 + c]
        gl = qk_a[1 + c] + qk_b[1 + c] + 2.0 * jnp.sum(qk_diag[:lap], axis=0)
        gd = qk_a[2 + c :] + qk_b[2 + c :] + 2.0 * qk_diag[lap:]

        # --- softmax jet over the source axis S (last axis of [W,T,S]).
        # exp: the max shift is a constant of the linearization point.
        c0 = jnp.max(gx, axis=-1, keepdims=True)
        ex = jnp.exp(gx - c0)
        ej = ex[None] * gj
        ejsq = jnp.sum(jnp.square(gj[:lap]), axis=0)
        el = ex * (gl + ejsq)
        ed = ex[None] * (gd + jnp.square(gj[lap:]))

        # sum over S
        sx = jnp.sum(ex, axis=-1, keepdims=True)
        sj = jnp.sum(ej, axis=-1, keepdims=True)
        sl = jnp.sum(el, axis=-1, keepdims=True)
        sd = jnp.sum(ed, axis=-1, keepdims=True)

        # reciprocal jet: f1 = -1/s^2, f2 = 2/s^3
        rx = 1.0 / sx
        rx2 = rx * rx
        rx3 = rx2 * rx
        rj = -sj * rx2
        rl = -sl * rx2 + 2.0 * rx3 * jnp.sum(jnp.square(sj[:lap]), axis=0)
        rd = -sd * rx2 + 2.0 * rx3 * jnp.square(sj[lap:])

        # weights jet: w = e * r (bilinear product rule)
        wx = ex * rx
        wj = ej * rx + ex[None] * rj
        wl = el * rx + ex * rl + 2.0 * jnp.sum(ej[:lap] * rj[:lap], axis=0)
        wd = ed * rx + ex[None] * rd + 2.0 * ej[lap:] * rj[lap:]
        ws = jnp.concatenate([wx[None], wj, wl[None], wd], axis=0)

        # --- value contraction: [P,W,T,S] x [P,W,S,dh] -> [P,W,T,dh]
        wv_a = _bmm_wv(ws, bcast(vx))
        wv_b = _bmm_wv(bcast(wx), vs)
        wv_diag = _bmm_wv(wj, vs[1 : 1 + c])
        ax = wv_a[0]
        aj = wv_a[1 : 1 + c] + wv_b[1 : 1 + c]
        al = wv_a[1 + c] + wv_b[1 + c] + 2.0 * jnp.sum(wv_diag[:lap], axis=0)
        ad = wv_a[2 + c :] + wv_b[2 + c :] + 2.0 * wv_diag[lap:]

        head_outs.append(jnp.concatenate([ax[None], aj, al[None], ad], axis=0))

    # --- output projection: fold heads (head-major = wo's layout), one matmul
    # over all planes, bias on x.
    attn = jnp.concatenate(head_outs, axis=-1)
    out = _dot(attn.reshape(p * w * t, feat), wo_ref[...])
    out = out.reshape(p, w, t, feat)
    ox_ref[...] = out[0] + bo_ref[...].reshape(feat)
    oj_ref[...] = out[1 : 1 + c]
    ol_ref[...] = out[1 + c]
    od_ref[...] = out[2 + c :]


def _pick_walkers(batch: int) -> int | None:
    for cand in _WALKER_BLOCKS:
        if batch % cand == 0:
            return cand
    return None


@functools.partial(jax.jit, static_argnums=(10, 11))
def _fused_attention(
    x, j, l, d, wq, wk, wv, wo, biases, bo, num_heads: int, interpret: bool
):
    batch, t, feat = x.shape
    c, e = j.shape[0], d.shape[0]
    wblk = _pick_walkers(batch)
    grid = (batch // wblk,)

    def rowmap(i):
        return (i, 0, 0)

    def chmap(i):
        return (0, i, 0, 0)

    def fullmap(i):
        return (0, 0)

    jet_specs = [
        pl.BlockSpec((wblk, t, feat), rowmap),
        pl.BlockSpec((c, wblk, t, feat), chmap),
        pl.BlockSpec((wblk, t, feat), rowmap),
        pl.BlockSpec((e, wblk, t, feat), chmap),
    ]
    weight_specs = [pl.BlockSpec((feat, feat), fullmap)] * 4
    bias_specs = [pl.BlockSpec((1, feat), fullmap)] * 4
    bq, bk, bv = biases
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=jet_specs + weight_specs + bias_specs,
        out_specs=jet_specs,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(j.shape, j.dtype),
            jax.ShapeDtypeStruct(l.shape, l.dtype),
            jax.ShapeDtypeStruct(d.shape, d.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, j, l, d, wq, wk, wv, wo, bq, bk, bv, bo)


def supported(t: Jet) -> bool:
    """Whether the fused kernel applies: real f32 batched jet, blockable batch."""
    return (
        t.x.dtype == jnp.float32
        and t.x.ndim == 3  # [B, T, D]
        and _pick_walkers(t.x.shape[0]) is not None
    )


def attention_jet(p: dict, num_heads: int, t: Jet, interpret: bool | None = None) -> Jet:
    """Full jet attention in one Pallas kernel; drop-in for the primitive chain.

    Args:
        p: flax MultiHeadAttention parameter dict (``query``/``key``/``value``
            DenseGeneral kernels ``[D, H, dh]`` + biases ``[H, dh]``, ``out``
            kernel ``[H, dh, D]`` + bias ``[D]``).
        num_heads: number of attention heads H.
        t: input jet with ``x: [B, T, D]`` (flattened walker batch).
        interpret: run in interpret mode (defaults to True off-TPU so the CPU
            test mesh exercises the same code path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    feat = t.x.shape[-1]
    head_dim = feat // num_heads
    scale = 1.0 / np.sqrt(head_dim)

    def fold_in(name):
        kernel = p[name]["kernel"].reshape(feat, feat)
        bias = p[name]["bias"].reshape(1, feat)
        return kernel, bias

    wq, bq = fold_in("query")
    wk, bk = fold_in("key")
    wv, bv = fold_in("value")
    wq = wq * scale
    bq = bq * scale
    wo = p["out"]["kernel"].reshape(feat, feat)
    bo = p["out"]["bias"].reshape(1, feat)

    ox, oj, ol, od = _fused_attention(
        t.x, t.j, t.l, t.d, wq, wk, wv, wo, (bq, bk, bv), bo, num_heads, interpret
    )
    return Jet(ox, oj, ol, od)

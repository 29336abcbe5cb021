"""Fused single-pass LayerNorm over a forward-Laplacian jet (Pallas TPU kernel).

The jet LayerNorm composed from :mod:`deephall_tpu.ops.fwdlap` primitives
(``mean -> center -> square -> mean -> rsqrt -> bilinear mul -> scale``) is the
largest HBM-traffic item in the training step: the round-3 profiler trace shows
the four LayerNorm sites moving each ``[C, B, T, D]`` jet activation (~270 MB at
production shapes) through ~4-5 memory passes of multi-output XLA fusions,
~9 ms of the ~89 ms iteration (PERF_NOTES.md, "Measured roofline").  Arithmetic
intensity is a few FLOP/byte, so the only lever is fewer passes.

This kernel performs the whole jet LayerNorm in one pass: a block of rows with
*all* jet channels (primal ``x``, tangents ``j``, Laplacian ``l``, extra second
derivatives ``d``) resides in VMEM at once, every reduction (feature means,
variance channels, the cross-channel sums of the second-order chain rule) runs
on-core, and each element is read from and written to HBM exactly once.

Algebra (identical to the primitive composition, pinned by
``tests/test_jet_layernorm.py``): with per-row feature means subtracted from
every channel (``xc, jc, lc, dc``), the variance jet is

    var.x = E[xc^2]            var.j = 2 E[xc jc]
    var.l = 2 E[xc lc] + 2 sum_k E[jlap_k^2]
    var.d = 2 E[xc dc] + 2 E[jext^2]

the ``rsqrt(var + eps)`` jet uses ``f1 = -rs^3/2``, ``f2 = 3 rs^5/4``, and the
normalised output is the bilinear product ``xc * rs`` expanded channelwise.

The reference computes LayerNorm through flax and ``jax.hessian`` sweeps
(``/root/reference/deephall/networks/psiformer.py:77-90``); this fusion has no
reference counterpart — it exists because the TPU jet tower is HBM-bound.
"""

from __future__ import annotations

import functools

import jax
from jax import numpy as jnp
from jax.experimental import pallas as pl

from deephall_tpu.ops.fwdlap import Jet

# Row-block candidates, multiples of the f32 sublane tile (8).  The pipelined
# working set is chosen against the 16 MB scoped-VMEM limit via the measured
# cost model in :func:`_pick_rows` — the residual variant doubles the input
# planes (two full jets in, one out), which at production shapes (D=256,
# 20-channel jets) overflows at rows=112 but fits at 80.
_ROW_BLOCKS = (112, 96, 80, 64, 48, 32, 16, 8)

# Compiler-measured scoped-VMEM cost per (plane x row x feature) f32 element is
# ~2.42x the raw 4 bytes (double buffering + stack margin): the residual kernel
# at 60 planes x 112 rows x 256 feats allocated 16.67 MB.  Budget below the
# 16 MB limit with headroom.
_VMEM_BUDGET = 14.5e6
_BYTES_FACTOR = 4 * 2.5


def _kernel(*refs, lap: int, eps: float, residual: bool):
    if residual:
        (x_ref, j_ref, l_ref, d_ref, rx_ref, rj_ref, rl_ref, rd_ref,
         scale_ref, bias_ref, ox_ref, oj_ref, ol_ref, od_ref) = refs
        x = x_ref[...] + rx_ref[...]  # [R, D]
        j = j_ref[...] + rj_ref[...]  # [C, R, D]
        l = l_ref[...] + rl_ref[...]  # [R, D]
        d = d_ref[...] + rd_ref[...]  # [E, R, D]
    else:
        (x_ref, j_ref, l_ref, d_ref, scale_ref, bias_ref,
         ox_ref, oj_ref, ol_ref, od_ref) = refs
        x = x_ref[...]
        j = j_ref[...]
        l = l_ref[...]
        d = d_ref[...]

    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    jc = j - jnp.mean(j, axis=-1, keepdims=True)
    lc = l - jnp.mean(l, axis=-1, keepdims=True)
    dc = d - jnp.mean(d, axis=-1, keepdims=True)
    jlap, jext = jc[:lap], jc[lap:]

    var_x = jnp.mean(xc * xc, axis=-1, keepdims=True)  # [R, 1]
    var_j = 2.0 * jnp.mean(xc[None] * jc, axis=-1, keepdims=True)  # [C, R, 1]
    var_l = 2.0 * jnp.mean(xc * lc, axis=-1, keepdims=True) + 2.0 * jnp.sum(
        jnp.mean(jlap * jlap, axis=-1, keepdims=True), axis=0
    )
    var_d = 2.0 * jnp.mean(xc[None] * dc, axis=-1, keepdims=True) + 2.0 * jnp.mean(
        jext * jext, axis=-1, keepdims=True
    )

    rs = jax.lax.rsqrt(var_x + eps)
    f1 = -0.5 * rs * rs * rs
    f2 = 0.75 * rs * rs * rs * rs * rs
    rs_j = f1 * var_j
    rs_l = f1 * var_l + f2 * jnp.sum(var_j[:lap] * var_j[:lap], axis=0)
    rs_d = f1 * var_d + f2 * var_j[lap:] * var_j[lap:]

    scale = scale_ref[...]
    ox_ref[...] = (xc * rs) * scale + bias_ref[...]
    oj_ref[...] = (jc * rs + xc[None] * rs_j) * scale
    ol_ref[...] = (
        lc * rs + xc * rs_l + 2.0 * jnp.sum(jlap * rs_j[:lap], axis=0)
    ) * scale
    od_ref[...] = (dc * rs + xc[None] * rs_d + 2.0 * jext * rs_j[lap:]) * scale


def _pick_rows(rows: int, planes: int, feat: int) -> int | None:
    """Largest row block dividing ``rows`` whose working set fits scoped VMEM.

    ``planes`` counts every [rb, feat] slab live in the kernel (input jet
    channels, optional residual jet channels, output jet channels).
    """
    max_rows = _VMEM_BUDGET / (planes * feat * _BYTES_FACTOR)
    for cand in _ROW_BLOCKS:
        if cand <= max_rows and rows % cand == 0:
            return cand
    return None


@functools.partial(jax.jit, static_argnums=(6, 7))
def _fused_rows(x, j, l, d, scale, bias, eps: float, interpret: bool, *res):
    rows, feat = x.shape
    c, e = j.shape[0], d.shape[0]
    jet_planes = c + e + 2
    planes = jet_planes * (3 if res else 2)  # in (+ residual) + out
    rb = _pick_rows(rows, planes, feat)
    grid = (rows // rb,)

    def rowmap(i):
        return (i, 0)

    def chmap(i):
        return (0, i, 0)

    def fullmap(i):
        return (0, 0)

    jet_specs = [
        pl.BlockSpec((rb, feat), rowmap),
        pl.BlockSpec((c, rb, feat), chmap),
        pl.BlockSpec((rb, feat), rowmap),
        pl.BlockSpec((e, rb, feat), chmap),
    ]
    in_specs = list(jet_specs)
    if res:
        in_specs += jet_specs
    in_specs += [
        pl.BlockSpec((1, feat), fullmap),
        pl.BlockSpec((1, feat), fullmap),
    ]
    return pl.pallas_call(
        functools.partial(_kernel, lap=c - e, eps=eps, residual=bool(res)),
        grid=grid,
        in_specs=in_specs,
        out_specs=jet_specs,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(j.shape, j.dtype),
            jax.ShapeDtypeStruct(l.shape, l.dtype),
            jax.ShapeDtypeStruct(d.shape, d.dtype),
        ],
        interpret=interpret,
    )(x, j, l, d, *res, scale, bias)


def supported(t: Jet, residual: bool = False) -> bool:
    """Whether the fused kernel applies: real f32 jet with a blockable row count."""
    rows = 1
    for s in t.x.shape[:-1]:
        rows *= s
    jet_planes = t.j.shape[0] + t.d.shape[0] + 2
    planes = jet_planes * (3 if residual else 2)
    return (
        t.x.dtype == jnp.float32
        and t.x.ndim >= 2
        and _pick_rows(rows, planes, t.x.shape[-1]) is not None
    )


def layernorm_jet(
    p: dict,
    t: Jet,
    eps: float = 1e-5,
    residual: Jet | None = None,
    interpret: bool | None = None,
) -> Jet:
    """Single-pass fused LayerNorm of a jet; drop-in for the primitive chain.

    Args:
        p: flax LayerNorm parameter dict with ``scale``/``bias`` of ``[D]``.
        t: jet with feature axis last (``x: [*S, D]``, ``j: [C, *S, D]``, ...).
        eps: variance epsilon (flax default).
        residual: optional second jet added to ``t`` inside the kernel
            (``LN(t + residual)``) — the pre-norm residual sum is never
            materialised in HBM.
        interpret: run the kernel in interpret mode (defaults to True off-TPU so
            the CPU test mesh exercises the same code path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = t.x.shape
    feat = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s

    def flat(jet):
        return (
            jnp.broadcast_to(jet.x, shape).reshape(rows, feat),
            jnp.broadcast_to(jet.j, t.j.shape).reshape(t.j.shape[0], rows, feat),
            jnp.broadcast_to(jet.l, shape).reshape(rows, feat),
            jnp.broadcast_to(jet.d, t.d.shape).reshape(t.d.shape[0], rows, feat),
        )

    res = flat(residual) if residual is not None else ()
    ox, oj, ol, od = _fused_rows(
        *flat(t),
        p["scale"].reshape(1, feat),
        p["bias"].reshape(1, feat),
        eps,
        interpret,
        *res,
    )
    return Jet(
        ox.reshape(shape),
        oj.reshape(t.j.shape),
        ol.reshape(shape),
        od.reshape(t.d.shape),
    )

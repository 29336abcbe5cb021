"""Forward-Laplacian evaluation of the Psiformer log-wavefunction.

Mirrors ``networks/psiformer.py`` op for op, but propagates second-order jets
(:mod:`deephall_tpu.ops.fwdlap`) through a single forward pass instead of relying
on ``jax.hessian`` sweeps.  Reads the exact parameter tree produced by the flax
modules (the names are a checkpoint-compatibility invariant, so they are safe to
address directly); equivalence with ``model.apply`` and with the full-Hessian
local-energy path is pinned by ``tests/test_fwdlap.py``.

The Jastrow factor is folded in algebraically: the forward multiplies the orbital
matrices by ``exp(J/N)``, so ``log psi = J + logsumdet(Phi)`` exactly, and the
scalar Jastrow jet is simply added after the determinant.
"""

from __future__ import annotations

import math
import os

import jax
import numpy as np
from jax import numpy as jnp

from deephall_tpu.config import OrbitalType
from deephall_tpu.geometry import chord_distances, spinors
from deephall_tpu.networks.psiformer import Psiformer
from deephall_tpu.ops import fwdlap, jet_attention, jet_layernorm
from deephall_tpu.ops.fwdlap import Jet

# LayerNorm-jet lowering: "fused" routes blockable f32 jets through the
# single-pass Pallas kernel (ops/jet_layernorm.py); "chain" keeps the
# primitive composition.  A/B'd on hardware — see PERF_NOTES round 3.
JET_LAYERNORM_IMPL = os.environ.get("DEEPHALL_JET_LAYERNORM_IMPL", "chain")


def _dense(p: dict, t: Jet, use_bias: bool = True) -> Jet:
    kernel = p["kernel"]
    if jnp.iscomplexobj(t.x):
        kernel = kernel.astype(t.x.dtype)
    return fwdlap.linear(
        lambda v: v @ kernel, t, bias=p["bias"] if use_bias else None
    )


def _dense_general_last(p: dict, t: Jet) -> Jet:
    """DenseGeneral contracting the last axis into possibly-multiple feature axes."""
    kernel = p["kernel"]
    if jnp.iscomplexobj(t.x):
        kernel = kernel.astype(t.x.dtype)
    return fwdlap.linear(
        lambda v: jnp.tensordot(v, kernel, axes=[[-1], [0]]), t, bias=p.get("bias")
    )


def _layernorm(p: dict, t: Jet, eps: float = 1e-5, residual: Jet | None = None) -> Jet:
    """LayerNorm jet; ``residual`` (if given) is added first — ``LN(t + residual)``.

    The fused Pallas path folds the residual add into the kernel so the pre-norm
    sum never round-trips through HBM; the primitive chain adds it explicitly.
    """
    if JET_LAYERNORM_IMPL == "fused" and jet_layernorm.supported(
        t, residual=residual is not None
    ):
        return jet_layernorm.layernorm_jet(p, t, eps, residual=residual)
    if residual is not None:
        t = fwdlap.add(t, residual)
    mean = fwdlap.linear(lambda v: jnp.mean(v, axis=-1, keepdims=True), t)
    xc = Jet(t.x - mean.x, t.j - mean.j, t.l - mean.l, t.d - mean.d)
    var = fwdlap.linear(
        lambda v: jnp.mean(v, axis=-1, keepdims=True),
        fwdlap.elementwise(jnp.square, xc),
    )
    rs = fwdlap.elementwise(lambda v: jax.lax.rsqrt(v + eps), var)
    x_hat = fwdlap.bilinear(lambda a, b: a * b, xc, rs)
    return fwdlap.linear(lambda v: v * p["scale"], x_hat, bias=p["bias"])


# Jet attention lowering: "vpu" keeps the standard channel-leading layout
# (tiny spatial axes in the lanes); "bm" relayouts q/k/v to batch-minor so the
# softmax chain and both contractions run with the walker batch in the 128-wide
# lanes and the jet channels in the sublanes; "pallas" runs the whole jet
# attention (projections included) in one VMEM-resident kernel
# (ops/jet_attention.py).  Overridable for benchmarking.
JET_ATTENTION_IMPL = os.environ.get("DEEPHALL_JET_ATTENTION_IMPL", "bm")

# Jet tower layout: "std" keeps channel-leading activations with per-attention
# relayouts (JET_ATTENTION_IMPL above); "fullbm" runs the whole tower — dense
# layers, layernorms, attention, orbital/envelope contraction — in the
# batch-minor layout, relaying out once at the input features and once at the
# determinant; "tb" is token-major ([T, B, D] spatial) so the channel tensors
# tile as (B, D) with no sublane padding from the T electron tokens.  A/B
# measured on hardware (PERF_NOTES round 3).
JET_TOWER_IMPL = os.environ.get("DEEPHALL_JET_TOWER_IMPL", "std")


def _attention(p: dict, num_heads: int, t: Jet) -> Jet:
    if JET_ATTENTION_IMPL == "pallas" and jet_attention.supported(t):
        return jet_attention.attention_jet(p, num_heads, t)
    head_dim = t.x.shape[-1] // num_heads
    q = _dense_general_last(p["query"], t)
    k = _dense_general_last(p["key"], t)
    v = _dense_general_last(p["value"], t)
    q = fwdlap.linear(lambda z: z / jnp.sqrt(head_dim).astype(z.dtype), q)

    if JET_ATTENTION_IMPL == "bm" and t.x.ndim >= 3:
        return _attention_tail_bm(p, q, k, v)

    # [..., T, H, d] x [..., S, H, d] -> [..., T, S, H] (VPU-friendly contraction,
    # matching blocks.MultiHeadAttention's "vpu" lowering).
    logits = fwdlap.bilinear(
        lambda a, b: jnp.sum(a[..., :, None, :, :] * b[..., None, :, :, :], axis=-1),
        q,
        k,
    )
    # Softmax over the source axis as exp/sum/reciprocal/mul; the max shift is a
    # constant of the linearization point and cancels exactly.
    c = jnp.max(logits.x, axis=-2, keepdims=True)
    e = fwdlap.elementwise(jnp.exp, fwdlap.shift(logits, -c))
    s = fwdlap.linear(lambda z: jnp.sum(z, axis=-2, keepdims=True), e)
    r = fwdlap.elementwise(jnp.reciprocal, s)
    w = fwdlap.bilinear(lambda a, b: a * b, e, r)
    # [..., T, S, H] x [..., S, H, d] -> [..., T, H, d]
    attn = fwdlap.bilinear(
        lambda a, b: jnp.sum(a[..., None] * b[..., None, :, :, :], axis=-3), w, v
    )
    kernel = p["out"]["kernel"]
    return fwdlap.linear(
        lambda z: jnp.tensordot(z, kernel, axes=[[-2, -1], [0, 1]]),
        attn,
        bias=p["out"]["bias"],
    )


def _bm_softmax_chain(q, k, v):
    """Logits → softmax → value contraction of the batch-minor attention jet.

    Inputs and output are ``[T/S, H, dh, c, B]`` BMJets. Shared by the
    per-attention relayout path (``_attention_tail_bm``) and the fullbm tower
    (``_attention_bm_full``) so the softmax-jet algebra lives once.
    """
    # [T, H, dh, c, B] x [S, H, dh, c, B] -> [T, S, H, c, B]
    logits = fwdlap.bm_bilinear(
        lambda a, b: jnp.sum(a[:, None] * b[None], axis=-3), q, k
    )
    c0 = jnp.max(logits.x, axis=1, keepdims=True)  # constant at the lin. point
    e = fwdlap.bm_elementwise(jnp.exp, fwdlap.bm_shift(logits, -c0))
    s = fwdlap.bm_linear(lambda z: jnp.sum(z, axis=1, keepdims=True), e)
    r = fwdlap.bm_elementwise(jnp.reciprocal, s)
    w = fwdlap.bm_bilinear(lambda a, b: a * b, e, r)
    # [T, S, H, c, B] x [S, H, dh, c, B] -> [T, H, dh, c, B]
    return fwdlap.bm_bilinear(
        lambda a, b: jnp.sum(a[..., None, :, :] * b[None], axis=1), w, v
    )


def _attention_tail_bm(p: dict, q: Jet, k: Jet, v: Jet) -> Jet:
    """Scaled-dot-product attention jet in the batch-minor layout.

    All tensors between the q/k/v projections and the output projection carry
    ``[spatial..., channel, walkers]`` with the walker batch in the TPU lanes:
    the ``[T, S, H]`` softmax chain — 4 of 128 lanes in the standard layout —
    runs fully vectorised (see ``ops.fwdlap.BMJet``).
    """
    qb, batch_shape = fwdlap.to_bm(q, 3)  # [T, H, dh, c, B]
    kb, _ = fwdlap.to_bm(k, 3)
    vb, _ = fwdlap.to_bm(v, 3)
    attn = _bm_softmax_chain(qb, kb, vb)
    attn_std = fwdlap.from_bm(attn, batch_shape)  # [*B, T, H, dh]
    kernel = p["out"]["kernel"]
    return fwdlap.linear(
        lambda z: jnp.tensordot(z, kernel, axes=[[-2, -1], [0, 1]]),
        attn_std,
        bias=p["out"]["bias"],
    )


def _dense_bm(p: dict, t, use_bias: bool = True):
    """Dense layer in the batch-minor layout: feature axis at ``-3``.

    The contraction is one MXU matmul with ``(spatial..., channel, walker)`` as
    the free rows; XLA's layout assignment sees a consistent batch-minor graph.
    """
    kernel = p["kernel"]
    kernel = kernel.reshape(kernel.shape[0], -1)  # fold multi-feature heads
    if jnp.iscomplexobj(t.x):
        kernel = kernel.astype(t.x.dtype)
    out = fwdlap.bm_linear(
        lambda z: jnp.einsum("...dcb,de->...ecb", z, kernel), t
    )
    if use_bias and "bias" in p:
        bias = p["bias"].reshape(-1)
        out = fwdlap.bm_shift(out, bias[:, None, None])
    return out


def _layernorm_bm(p: dict, t, eps: float = 1e-5):
    mean = fwdlap.bm_linear(lambda v: jnp.mean(v, axis=-3, keepdims=True), t)
    xc = fwdlap.BMJet(t.x - mean.x, t.j - mean.j, t.l - mean.l, t.d - mean.d)
    var = fwdlap.bm_linear(
        lambda v: jnp.mean(v, axis=-3, keepdims=True),
        fwdlap.bm_elementwise(jnp.square, xc),
    )
    rs = fwdlap.bm_elementwise(lambda v: jax.lax.rsqrt(v + eps), var)
    x_hat = fwdlap.bm_bilinear(lambda a, b: a * b, xc, rs)
    scaled = fwdlap.bm_linear(lambda v: v * p["scale"][:, None, None], x_hat)
    return fwdlap.bm_shift(scaled, p["bias"][:, None, None])


def _attention_bm_full(p: dict, num_heads: int, t):
    """Attention entirely in the batch-minor layout (input ``[T, D, c, B]``)."""
    features = t.x.shape[-3]
    head_dim = features // num_heads

    def heads(dense_out):
        return fwdlap.bm_linear(
            lambda z: z.reshape(*z.shape[:-3], num_heads, head_dim, *z.shape[-2:]),
            dense_out,
        )

    q = heads(_dense_bm(p["query"], t))  # [T, H, dh, c, B]
    k = heads(_dense_bm(p["key"], t))
    v = heads(_dense_bm(p["value"], t))
    q = fwdlap.bm_linear(lambda z: z / jnp.sqrt(head_dim).astype(z.dtype), q)

    attn = _bm_softmax_chain(q, k, v)  # [T, H, dh, c, B]

    kernel = p["out"]["kernel"].reshape(num_heads * head_dim, -1)
    folded = fwdlap.bm_linear(
        lambda z: z.reshape(*z.shape[:-4], num_heads * head_dim, *z.shape[-2:]),
        attn,
    )
    out = fwdlap.bm_linear(
        lambda z: jnp.einsum("...dcb,de->...ecb", z, kernel), folded
    )
    return fwdlap.bm_shift(out, p["out"]["bias"][:, None, None])


def _tower_fullbm(model, p: dict, h0: Jet, env: Jet, nspins) -> Jet:
    """Psiformer tower + orbital construction in the batch-minor layout.

    Takes the input-feature jet ``h0`` (standard layout, ``[*B, N, 4]``) and the
    envelope jet ``env`` (``[*B, N, n_orb]`` complex), relayouts each once, runs
    the full tower batch-minor, and returns the orbital-matrix jet in the
    standard layout expected by :func:`fwdlap.logsumdet_jet`.
    """
    tower = p["PsiformerLayers_0"]
    h, batch_shape = fwdlap.to_bm(h0, 2)  # [N, 4, c, B]
    h = _dense_bm(tower["Dense_0"], h, use_bias=False)
    for i in range(model.num_layers):
        attn = _attention_bm_full(tower[f"MultiHeadAttention_{i}"], model.num_heads, h)
        proj = _dense_bm(tower[f"Dense_{2 * i + 1}"], attn, use_bias=False)
        h = fwdlap.BMJet(h.x + proj.x, h.j + proj.j, h.l + proj.l, h.d + proj.d)
        h = _layernorm_bm(tower[f"LayerNorm_{2 * i}"], h)
        mlp = fwdlap.bm_elementwise(jnp.tanh, _dense_bm(tower[f"Dense_{2 * i + 2}"], h))
        h = fwdlap.BMJet(h.x + mlp.x, h.j + mlp.j, h.l + mlp.l, h.d + mlp.d)
        h = _layernorm_bm(tower[f"LayerNorm_{2 * i + 1}"], h)

    # Spin-sector complex orbital projections; sectors concatenate along the
    # electron axis (leading spatial axis in this layout).
    orb_params = p["Orbitals_0"]["featured_orbitals"]
    sectors = []
    bounds = [(0, nspins[0]), (nspins[0], nspins[0] + nspins[1])]
    index = 0
    for lo, hi in bounds:
        if hi == lo:
            continue
        wr = orb_params[f"DenseGeneral_{index}"]
        wi = orb_params[f"DenseGeneral_{index + 1}"]
        index += 2
        kernel = (wr["kernel"] + 1j * wi["kernel"]).reshape(wr["kernel"].shape[0], -1)
        bias = (wr["bias"] + 1j * wi["bias"]).reshape(-1)
        h_alpha = fwdlap.bm_linear(lambda v, lo=lo, hi=hi: v[lo:hi], h)
        sector = fwdlap.bm_linear(
            lambda v, kernel=kernel: jnp.einsum(
                "...dcb,de->...ecb", v.astype(kernel.dtype), kernel
            ),
            h_alpha,
        )
        sector = fwdlap.bm_shift(sector, bias[:, None, None])
        feat_shape = wr["kernel"].shape[1:]  # (F, ne, nd) or (8, ne, nd)
        sector = fwdlap.bm_linear(
            lambda z, fs=feat_shape: z.reshape(*z.shape[:-3], *fs, *z.shape[-2:]),
            sector,
        )
        sectors.append(sector)  # [N_s, F, ne, nd, c, B]
    if len(sectors) == 1:
        orbitals = sectors[0]
    else:
        orbitals = fwdlap.BMJet(
            *(jnp.concatenate(parts, axis=0) for parts in zip(*sectors))
        )

    if model.orbital_type == OrbitalType.sparse:
        lll = p["Orbitals_0"]["lll_weight"]
        kernel = lll["kernel"].astype(orbitals.x.dtype)
        orbitals = fwdlap.bm_linear(
            lambda z: jnp.einsum("nfedcb,fo->noedcb", z, kernel), orbitals
        )
        if "bias" in lll:
            orbitals = fwdlap.bm_shift(
                orbitals, lll["bias"][:, None, None, None, None]
            )

    env_bm, _ = fwdlap.to_bm(env, 2)  # [N, n_orb, c, B]
    phi_bm = fwdlap.bm_bilinear(
        lambda o, e: jnp.sum(o * e[:, :, None, None], axis=1), orbitals, env_bm
    )  # [N, ne, nd, c, B]
    contracted = fwdlap.from_bm(phi_bm, batch_shape)  # [*B, N, ne, nd]
    return fwdlap.linear(lambda v: jnp.moveaxis(v, -1, -3), contracted)


def _featured_orbitals(
    p: dict, t: Jet, nspins: tuple[int, int], token_axis: int = -2
) -> Jet:
    """Per-spin-sector complex orbital projections.

    ``token_axis`` is the electron axis of the tower activations: ``-2`` for
    the standard ``[*B, T, D]`` layout, ``-3`` for the token-major
    ``[T, B, D]`` one (``_tower_tb``).
    """
    if token_axis == -2:
        def slicer(v, lo, hi):
            return v[..., lo:hi, :]
        cat_axis = -4
    else:
        assert token_axis == -3, token_axis
        def slicer(v, lo, hi):
            return v[..., lo:hi, :, :]
        cat_axis = -5
    sectors = []
    bounds = [(0, nspins[0]), (nspins[0], nspins[0] + nspins[1])]
    index = 0
    for lo, hi in bounds:
        if hi == lo:
            continue
        wr = p[f"DenseGeneral_{index}"]
        wi = p[f"DenseGeneral_{index + 1}"]
        index += 2
        kernel = wr["kernel"] + 1j * wi["kernel"]
        bias = wr["bias"] + 1j * wi["bias"]
        h_alpha = fwdlap.linear(lambda v, lo=lo, hi=hi: slicer(v, lo, hi), t)
        sectors.append(
            fwdlap.linear(
                lambda v, kernel=kernel: jnp.tensordot(
                    v.astype(kernel.dtype), kernel, axes=[[-1], [0]]
                ),
                h_alpha,
                bias=bias,
            )
        )
    if len(sectors) == 1:
        return sectors[0]
    return Jet(
        *(jnp.concatenate(parts, axis=cat_axis) for parts in zip(*sectors))
    )


def _attention_tb(p: dict, num_heads: int, t: Jet) -> Jet:
    """Attention jet for the token-major tower (spatial ``[T, B, D]``)."""
    head_dim = t.x.shape[-1] // num_heads
    q = _dense_general_last(p["query"], t)  # [T, B, H, dh]
    k = _dense_general_last(p["key"], t)
    v = _dense_general_last(p["value"], t)
    q = fwdlap.linear(lambda z: z / jnp.sqrt(head_dim).astype(z.dtype), q)
    attn = _bm_softmax_chain(
        fwdlap.to_bm_tb(q), fwdlap.to_bm_tb(k), fwdlap.to_bm_tb(v)
    )
    attn_tb = fwdlap.from_bm_tb(attn)  # [T, B, H, dh]
    kernel = p["out"]["kernel"]
    return fwdlap.linear(
        lambda z: jnp.tensordot(z, kernel, axes=[[-2, -1], [0, 1]]),
        attn_tb,
        bias=p["out"]["bias"],
    )


def _tower_tb(model, p: dict, h0: Jet, env: Jet, nspins) -> Jet:
    """Psiformer tower + orbital construction in the token-major layout.

    The standard layout's channel tensors carry spatial ``[B, T, D]``, whose
    physical tile is ``(T, D)`` — T electron tokens pad the 8-sublane axis
    (6/8 at N=6, 12/16 at N=12) on every elementwise access. Here the tower
    runs with spatial ``[T, B, D]`` so the tiled minor dims are ``(B, D)``,
    both saturated; dense, layernorm and the residual adds are axis(-1)
    generic, and attention relays to the same batch-minor softmax chain as
    the default path (one transpose either way). Gated by
    ``DEEPHALL_JET_TOWER_IMPL=tb``; pinned against the standard tower in
    ``tests/test_fwdlap.py``.
    """
    h = fwdlap.jet_moveaxis(h0, -2, -3)  # [B, T, F] -> [T, B, F]
    tower = p["PsiformerLayers_0"]
    h = _dense(tower["Dense_0"], h, use_bias=False)
    for i in range(model.num_layers):
        attn = _attention_tb(tower[f"MultiHeadAttention_{i}"], model.num_heads, h)
        proj = _dense(tower[f"Dense_{2 * i + 1}"], attn, use_bias=False)
        h = _layernorm(tower[f"LayerNorm_{2 * i}"], h, residual=proj)
        mlp = fwdlap.elementwise(jnp.tanh, _dense(tower[f"Dense_{2 * i + 2}"], h))
        h = _layernorm(tower[f"LayerNorm_{2 * i + 1}"], h, residual=mlp)

    orb_params = p["Orbitals_0"]["featured_orbitals"]
    orbitals = _featured_orbitals(orb_params, h, nspins, token_axis=-3)
    # [N, B, F, ne, nd]

    if model.orbital_type == OrbitalType.sparse:
        lll = p["Orbitals_0"]["lll_weight"]
        kernel = lll["kernel"].astype(orbitals.x.dtype)
        orbitals = fwdlap.linear(
            lambda v: jnp.tensordot(v, kernel, axes=[[-3], [0]]),
            orbitals,
            bias=lll.get("bias"),
        )  # [N, B, ne, nd, n_orb]
        orbitals = fwdlap.linear(lambda v: jnp.moveaxis(v, -1, -3), orbitals)

    env_tb = fwdlap.jet_moveaxis(env, -2, -3)  # [B, N, n_orb] -> [N, B, n_orb]
    contracted = fwdlap.bilinear(
        lambda o, e: jnp.sum(o * e[..., None, None], axis=-3), orbitals, env_tb
    )  # [N, B, ne, nd]
    contracted = fwdlap.jet_moveaxis(contracted, -4, -3)  # -> [B, N, ne, nd]
    return fwdlap.linear(lambda v: jnp.moveaxis(v, -1, -3), contracted)


def psiformer_logpsi_jet(
    model: Psiformer, params, data: jnp.ndarray, compute_l2: bool = False
) -> Jet:
    """Second-order jet of ``log psi`` at batched configurations ``[*B, N, 2]``.

    Args:
        model: Psiformer hyperparameters.
        params: Parameter tree (flax auto-naming).
        data: ``[*B, N, 2]`` configurations.
        compute_l2: Also carry the x/y L^2 directions (extras = 3 instead of 1;
            the z direction coincides with the Lz one).

    Returns:
        Scalar-per-walker :class:`Jet` seeded with :func:`fwdlap.electron_seeds`.
    """
    p = params["params"] if "params" in params else params
    extras = 3 if compute_l2 else 1
    seeds = fwdlap.electron_seeds(data, compute_l2)
    spins = jnp.array([1] * model.nspins[0] + [-1] * model.nspins[1])

    def input_feature(e):
        theta, phi = e[..., 0], e[..., 1]
        return jnp.stack(
            [
                jnp.cos(theta),
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
                jnp.broadcast_to(spins, theta.shape),
            ],
            axis=-1,
        )

    n_orb = int(2 * model.Q) + 1
    norm_factor = jnp.asarray(
        np.sqrt([math.comb(n_orb - 1, k) for k in range(n_orb)]), jnp.float32
    )
    m = jnp.arange(-model.Q, model.Q + 1)

    def envelope_fn(e):
        theta, phi = e[..., 0], e[..., 1]
        u, v = spinors(theta, phi)
        return (
            norm_factor
            * u[..., None] ** (model.Q + m)
            * v[..., None] ** (model.Q - m)
        )

    h0 = fwdlap.jet_of_fn(input_feature, data, seeds, extras)
    env = fwdlap.jet_of_fn(envelope_fn, data, seeds, extras)  # [*B, N, n_orb] complex

    if JET_TOWER_IMPL == "fullbm" and data.ndim >= 3:
        phi_jet = _tower_fullbm(model, p, h0, env, model.nspins)
    elif JET_TOWER_IMPL == "tb" and data.ndim == 3:
        phi_jet = _tower_tb(model, p, h0, env, model.nspins)
    else:
        tower = p["PsiformerLayers_0"]
        h = _dense(tower["Dense_0"], h0, use_bias=False)
        for i in range(model.num_layers):
            attn = _attention(tower[f"MultiHeadAttention_{i}"], model.num_heads, h)
            proj = _dense(tower[f"Dense_{2 * i + 1}"], attn, use_bias=False)
            h = _layernorm(tower[f"LayerNorm_{2 * i}"], h, residual=proj)
            mlp = fwdlap.elementwise(jnp.tanh, _dense(tower[f"Dense_{2 * i + 2}"], h))
            h = _layernorm(tower[f"LayerNorm_{2 * i + 1}"], h, residual=mlp)

        orb_params = p["Orbitals_0"]["featured_orbitals"]
        orbitals = _featured_orbitals(orb_params, h, model.nspins)  # [*B, N, F, ne, nd]

        if model.orbital_type == OrbitalType.sparse:
            lll = p["Orbitals_0"]["lll_weight"]
            kernel = lll["kernel"].astype(orbitals.x.dtype)
            orbitals = fwdlap.linear(
                lambda v: jnp.tensordot(v, kernel, axes=[[-3], [0]]),
                orbitals,
                bias=lll.get("bias"),
            )  # [*B, N, ne, nd, n_orb]
            orbitals = fwdlap.linear(lambda v: jnp.moveaxis(v, -1, -3), orbitals)

        contracted = fwdlap.bilinear(
            lambda o, e: jnp.sum(o * e[..., None, None], axis=-3), orbitals, env
        )
        phi_jet = fwdlap.linear(lambda v: jnp.moveaxis(v, -1, -3), contracted)

    n_up, n_down = model.nspins

    def jastrow_fn(e):
        r_ee = chord_distances(e)
        iu_up = jnp.triu_indices(n_up, k=1)
        iu_down = jnp.triu_indices(n_down, k=1)
        r_parallel = jnp.concatenate(
            [
                r_ee[..., :n_up, :n_up][..., iu_up[0], iu_up[1]],
                r_ee[..., n_up:, n_up:][..., iu_down[0], iu_down[1]],
            ],
            axis=-1,
        )
        total = jnp.zeros(r_ee.shape[:-2])
        if r_parallel.shape[-1] > 0:
            alpha_par = p["Jastrow_0"]["ee_par"]
            total += jnp.sum(
                -(0.25 * alpha_par**2) / (alpha_par + r_parallel), axis=-1
            )
        if n_up > 0:
            alpha_anti = p["Jastrow_0"]["ee_anti"]
            r_anti = r_ee[..., :n_up, n_up:]
            total += jnp.sum(
                -(0.5 * alpha_anti**2) / (alpha_anti + r_anti), axis=(-2, -1)
            )
        return total

    jastrow = fwdlap.jet_of_fn(jastrow_fn, data, seeds, extras)
    return fwdlap.add(fwdlap.logsumdet_jet(phi_jet), jastrow)

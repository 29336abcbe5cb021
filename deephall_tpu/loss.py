"""Clipped-energy VMC loss and gradient estimator.

Statistical parity with the reference (``/root/reference/deephall/loss.py``): IQR
clipping of the local energy (real and imaginary parts separately, median +- 100 IQR),
optional Lz / L^2 penalty terms, NaN-resistant means, and the gradient estimator

    grad E = 2 Re E_i[ conj(d log psi_i / d params) (E_L,i - E_clipped) ].

TPU-first redesign: the reference materialises **per-walker parameter gradients** with
``vmap(jax.value_and_grad)`` (``loss.py:53-58``) — O(batch x params) memory — and then
contracts them against the clipped energy differences.  Because that contraction is a
plain weighted sum, the same estimator is computed here with a **single weighted VJP**
over the batched forward pass: cotangents ``w_i = 2 (E_L,i - E_clip)/B`` on
``(Re log psi, Im log psi)``.  Memory drops to O(params) and XLA fuses the backward
pass with the batched forward.  Reductions are global means, which XLA partitions into
per-shard sums plus an all-reduce over ICI.
"""

from __future__ import annotations

import enum
from collections.abc import Callable

import jax
from jax import numpy as jnp

from deephall_tpu.config import System
from deephall_tpu.hamiltonian import forward_laplacian_local_energy, local_energy
from deephall_tpu.networks.psiformer import Psiformer
from deephall_tpu.types import ArrayTree, LogPsiNetwork, LossStats


def iqr_clip_real(x: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    q1 = jnp.nanquantile(x, 0.25)
    q3 = jnp.nanquantile(x, 0.75)
    iqr = q3 - q1
    return jnp.clip(x, q1 - scale * iqr, q3 + scale * iqr)


def iqr_clip(x: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    return iqr_clip_real(x.real, scale) + 1j * iqr_clip_real(x.imag, scale)


def orthogonality_stats_and_diff(
    log_ratios: jnp.ndarray, penalty: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap penalties against fixed lower states, from one walker ensemble.

    Excited-state VMC beyond the reference's surface (its loss has only the
    Lz / L^2 penalties, ``/root/reference/deephall/loss.py:76-88``): state
    ``k`` is found by minimising ``E + penalty * sum_j O_j`` over the fixed,
    already-converged states ``phi_j``, where

        O_j = |<phi_j|psi>|^2 / (<phi_j|phi_j><psi|psi>) = |E[rho_j]|^2 / E[|rho_j|^2]

    with ``rho_j,i = phi_j(x_i)/psi(x_i)`` and both expectations over the *same*
    ``|psi|^2`` walkers — no second ensemble needed.  The exact parameter
    gradient of ``O_j`` (explicit ``rho`` dependence plus the sampling-measure
    term) collapses to the same covariance form as the energy gradient,

        dO_j = E[ Re( conj(w_i) d log psi_i ) ],
        w_i  = 2 ( conj(r) rho_i / n  -  O_j ),   r = E[rho],  n = E[|rho|^2],

    so it folds into the clipped-difference vector consumed by the loss VJP as
    ``diff_i += penalty * (conj(r) rho_i / n - O_j)`` (the driver's
    ``vjp_weights`` supplies the factor ``2/B``).  Shift-invariance in the
    ``log rho`` real part makes the estimator overflow-safe.

    Args:
        log_ratios: ``[n_states, batch]`` complex ``log(phi_j(x_i)/psi(x_i))``.
        penalty: Penalty strength (must exceed the target gap to push the
            optimum off the lower states).

    Returns:
        ``(overlap, diff)``: the real total overlap ``sum_j O_j`` (logged per
        step) and the complex per-walker gradient weights ``[batch]``.
    """
    log_ratios = jax.lax.stop_gradient(log_ratios)
    shift = jnp.nan_to_num(
        jnp.nanmax(log_ratios.real, axis=1, keepdims=True), posinf=0.0, neginf=0.0
    )
    rho = jnp.exp(log_ratios - shift)  # O == |r|^2/n is invariant to real shifts
    r = jnp.nanmean(rho, axis=1, keepdims=True)
    n = jnp.nanmean(jnp.abs(rho) ** 2, axis=1, keepdims=True)
    overlap = jnp.abs(r) ** 2 / n  # [n_states, 1]
    diff = penalty * (jnp.conj(r) * rho / n - overlap)  # [n_states, batch]
    return jnp.sum(overlap), jnp.sum(diff, axis=0)


class LossMode(enum.Enum):
    ENERGY_GRAD = enum.auto()
    ENERGY_DIFF = enum.auto()
    SR_F_VECTOR = enum.auto()


def stats_and_clipped_diff(
    system: System,
    el: jnp.ndarray,
    other_observables: dict,
    log_ratios: jnp.ndarray | None = None,
    penalties: dict | None = None,
) -> tuple[LossStats, jnp.ndarray]:
    """Per-step statistics and the clipped per-walker energy differences.

    Implements the reference estimator's clipping and penalty assembly
    (``/root/reference/deephall/loss.py:66-91``): IQR clipping of the local
    energy, optional Lz / L^2 penalty terms folded into the differences, and
    NaN-resistant means for the logged statistics.  ``log_ratios`` (per-walker
    ``log(phi_j/psi)`` against fixed lower states) additionally folds in the
    excited-state overlap penalty and adds a real ``overlap`` statistic — see
    :func:`orthogonality_stats_and_diff`.

    ``penalties`` (``system.dynamic_penalties``): a non-empty dict of traced
    scalars ``{lz_penalty, lz_center, l2_penalty, l2_center,
    overlap_penalty}`` replaces
    the static config values so penalty sweeps share one compiled step; the
    penalty terms are then assembled unconditionally (a zero scalar multiplies
    them away at runtime, which is exact: each term is ``penalty * (...)``).
    """
    # nanmean like the energy statistic below: a single walker pinned near a
    # coordinate pole makes its local L^2 (the 1/tan, 1/sin^2 terms) overflow
    # to NaN while its energy stays finite, and a plain mean would log a NaN
    # L_square row for the whole step (measured ~1-2 per 1000 steps in the
    # sector-penalty runs, runs/roton13).
    mean_observables = jax.tree.map(jnp.nanmean, other_observables)
    loss = jnp.nanmean(el)
    clipped_loss = jnp.nanmean(iqr_clip(el))
    diff_to_clip = el - clipped_loss
    dynamic = bool(penalties)
    if log_ratios is not None:
        overlap, ortho_diff = orthogonality_stats_and_diff(
            log_ratios,
            penalties["overlap_penalty"] if dynamic else system.overlap_penalty,
        )
        mean_observables["overlap"] = overlap
        diff_to_clip += ortho_diff
    # L^2 selector first: its adaptive effective stiffness feeds the Lz raise.
    k_eff = None
    if (dynamic and system.compute_l2) or system.l2_penalty:
        l2_penalty = penalties["l2_penalty"] if dynamic else system.l2_penalty
        l2_center = penalties["l2_center"] if dynamic else system.l2_center
        l2 = other_observables["angular_momentum_square"]
        clipped_l2 = jnp.nanmean(iqr_clip_real(l2))
        if system.l2_adaptive:
            # Deviation-proportional stiffness (config.System.l2_adaptive):
            # full k while >= 1 above the target multiplet, fading linearly
            # to zero at it — purify and settle become one self-annealing
            # stage, unbiased at the converged eigenstate where it vanishes.
            k_eff = l2_penalty * jnp.clip(clipped_l2 - l2_center, 0.0, 1.0)
        else:
            # One-sided selector gate (system.l2_center): the penalty gradient
            # is k * relu(<L^2> - c) — zero below the floor, the plain linear
            # pull above it.  c = 0 (the default, and the reference semantics)
            # leaves the gate always open since <L^2> >= 0.  The gate reads
            # the clipped batch mean, so one node-crossing walker cannot flip
            # it.
            k_eff = l2_penalty * (clipped_l2 > l2_center).astype(l2.real.dtype)
        diff_to_clip += k_eff * (l2 - clipped_l2)
    if dynamic or system.lz_penalty:
        lz_penalty = penalties["lz_penalty"] if dynamic else system.lz_penalty
        lz_center = penalties["lz_center"] if dynamic else system.lz_center
        if system.l2_adaptive and k_eff is not None:
            # Keep the instantaneous selector inside the cross-sector
            # tunneling window (k < 0.8 lz / 2m) by raising Lz stiffness with
            # it; unbiased at the in-sector target, where <(Lz - m)^2> = 0.
            lz_penalty = jnp.maximum(lz_penalty, 3.0 * lz_center * k_eff)
        lz_square = other_observables["angular_momentum_z_square"]
        lz = other_observables["angular_momentum_z"]
        clipped_lz_square = jnp.nanmean(iqr_clip_real(lz_square))
        clipped_lz = jnp.nanmean(iqr_clip_real(lz))
        diff_to_clip += lz_penalty * (
            (lz_square - clipped_lz_square)
            - 2 * lz_center * (lz - clipped_lz)
        )
    diff = iqr_clip(diff_to_clip)

    variance = jnp.nanmean(el.real**2) - loss.real**2
    stats = LossStats(**mean_observables, energy=loss, variance=variance)
    return stats, diff


def vjp_weights(diff: jnp.ndarray) -> jnp.ndarray:
    """Cotangent weights ``w_i = 2 (E_L,i - E_clip) / count`` for the gradient VJP."""
    valid = ~jnp.isnan(diff)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jax.lax.stop_gradient(
        jnp.where(valid, jnp.nan_to_num(diff), 0) * (2.0 / count)
    )


def fixed_state_log_ratios(
    fixed_states, logpsi: jnp.ndarray, data: jnp.ndarray
) -> jnp.ndarray:
    """``[n_states, batch]`` complex ``log(phi_j(x_i)/psi(x_i))`` (stop-gradient)."""
    logpsi = jax.lax.stop_gradient(logpsi)
    return jnp.stack([f(data) for f in fixed_states]) - logpsi[None]


def make_loss_fn(
    network: LogPsiNetwork,
    system: System,
    mode: LossMode = LossMode.ENERGY_GRAD,
    model=None,
    fixed_states=None,
) -> Callable[[ArrayTree, jnp.ndarray], tuple[LossStats, ArrayTree]]:
    """Create ``(params, data) -> (stats, grads_or_diff)`` for the given mode.

    Modes (reference ``loss.py:41-44``): ``ENERGY_GRAD`` returns real parameter
    gradients; ``ENERGY_DIFF`` returns the clipped per-walker energy differences (used
    by the inference optimizer and the initial-energy probe); ``SR_F_VECTOR`` returns
    the complex tangent for stochastic reconfiguration.

    When ``model`` is the Psiformer, the local energy uses the forward-Laplacian
    pipeline — one second-order forward pass instead of 2N Hessian tangent
    sweeps; ``L^2`` (observable or penalty) adds two jet directions rather
    than falling back to the full Hessian.  Other networks (Laughlin inference)
    use the per-config Hessian path under ``vmap``.

    ``fixed_states`` (excited-state VMC) is a sequence of batched callables
    ``data -> log phi_j`` for already-converged lower states; their overlap
    penalties fold into the gradient weights (:func:`orthogonality_stats_and_diff`).
    The gradient modes evaluate ``log psi`` through one explicit ``jax.vjp``
    whose primal feeds the overlap ratios and whose pullback serves both the
    real and (for SR) imaginary weighted cotangents — no extra forward pass.
    """
    if model is not None and isinstance(model, Psiformer):
        batch_local_energy = forward_laplacian_local_energy(model, system)
    else:
        batch_local_energy = jax.vmap(local_energy(network, system), in_axes=(None, 0))

    def loss_and_grad(
        params: ArrayTree, data: jnp.ndarray, penalties: dict | None = None
    ):
        el, other_observables = batch_local_energy(params, data)
        if mode == LossMode.ENERGY_DIFF:
            log_ratios = (
                fixed_state_log_ratios(fixed_states, network(params, data), data)
                if fixed_states
                else None
            )
            stats, diff = stats_and_clipped_diff(
                system, el, other_observables, log_ratios, penalties
            )
            return stats, diff

        def split_logpsi(p):
            logpsi = network(p, data)  # natively batched
            return logpsi.real, logpsi.imag

        (re, im), pullback = jax.vjp(split_logpsi, params)
        log_ratios = (
            fixed_state_log_ratios(fixed_states, re + 1j * im, data)
            if fixed_states
            else None
        )
        stats, diff = stats_and_clipped_diff(
            system, el, other_observables, log_ratios, penalties
        )
        w = vjp_weights(diff)
        # Re[conj(grad logpsi) w] = grad(Re psi) . Re w + grad(Im psi) . Im w
        (g_re,) = pullback((w.real, w.imag))
        if mode == LossMode.ENERGY_GRAD:
            return stats, jax.tree.map(jnp.nan_to_num, g_re)

        # SR_F_VECTOR: the complex tangent, from one more pullback.
        # Im[conj(grad logpsi) w] = grad(Re psi) . Im w - grad(Im psi) . Re w
        (g_im,) = pullback((w.imag, -w.real))
        return stats, jax.tree.map(
            lambda a, b: jnp.nan_to_num(a) + 1j * jnp.nan_to_num(b), g_re, g_im
        )

    return loss_and_grad


def make_loss_and_capture_fn(
    system: System, model, fixed_states=None
) -> Callable[[ArrayTree, jnp.ndarray], tuple]:
    """Energy gradient *and* KFAC curvature capture from one shared forward.

    The plain composition runs the batched ``log psi`` forward twice per step:
    once inside the loss's weighted VJP and once inside KFAC's tap-capture VJP
    (the reference pays the same twice via ``vmap(value_and_grad)`` plus
    kfac_jax's own forward, ``/root/reference/deephall/loss.py:53-58`` +
    ``kfac.py:195-241``).  Both are pullbacks of the *same* linearization, so
    one ``jax.vjp`` over ``(params, taps)`` serves both: the weighted cotangent
    gives the energy gradient, and the ``sqrt(2)``-uniform cotangent gives every
    layer's output sensitivities for the exact Fisher — sharing the forward
    pass and its stored residuals.

    Returns:
        ``(params, data) -> (stats, grads, sown, dy)`` where ``sown``/``dy``
        are the raw KFAC collection trees (layer inputs / tap cotangents).
    """
    from deephall_tpu.networks.blocks import (
        FISHER_COTANGENT,
        KFAC_IN,
        KFAC_TAPS,
        zero_taps,
    )

    batch_local_energy = forward_laplacian_local_energy(model, system)

    def loss_grad_capture(
        params: ArrayTree, data: jnp.ndarray, penalties: dict | None = None
    ):
        el, other_observables = batch_local_energy(params, data)

        taps0 = zero_taps(model, params, data)

        def f(p, taps):
            variables = dict(p)
            variables[KFAC_TAPS] = taps
            out, aux = model.apply(variables, data, mutable=[KFAC_IN])
            return (out.real, out.imag), aux[KFAC_IN]

        (re, im), pullback, sown = jax.vjp(f, params, taps0, has_aux=True)
        log_ratios = (
            fixed_state_log_ratios(fixed_states, re + 1j * im, data)
            if fixed_states
            else None
        )
        stats, diff = stats_and_clipped_diff(
            system, el, other_observables, log_ratios, penalties
        )
        w = vjp_weights(diff)
        # One batched pullback serves both cotangents: row 0 is the weighted
        # energy cotangent (Re[conj(grad logpsi) w] = grad(Re psi) . Re w +
        # grad(Im psi) . Im w), row 1 the sqrt(2)-uniform exact-Fisher
        # cotangent.  Two separate pullback calls traverse the backward graph
        # twice and re-read every stored residual from HBM; the vmapped
        # pullback reads each residual once and carries a 2-row cotangent
        # through the same graph (the workload is HBM-bound — PERF_NOTES
        # roofline).
        cotangents = (
            jnp.stack([w.real, jnp.full_like(w.real, FISHER_COTANGENT)]),
            jnp.stack([w.imag, jnp.zeros_like(w.imag)]),
        )
        grads2, dy2 = jax.vmap(pullback)(cotangents)
        grads = jax.tree.map(lambda a: a[0], grads2)
        dy = jax.tree.map(lambda a: a[1], dy2)
        return stats, jax.tree.map(jnp.nan_to_num, grads), sown, dy

    return loss_grad_capture

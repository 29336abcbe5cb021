"""Complex determinant evaluation for wavefunctions.

The wavefunction is a (sum of) complex determinant(s) of tiny ``[nelec, nelec]``
matrices, evaluated in log space (reference ``psiformer.py:72-76``,
``laughlin.py:53-57``).

TPU notes:

* XLA's LAPACK-style complex LU (``jnp.linalg.slogdet``) is not implemented on the TPU
  backend, so this module carries its own unrolled partial-pivot elimination.
  ``nelec`` is tiny (<= ~16), so the O(N) unrolled steps of O(N^2) vector work stay in
  registers/VMEM and batch over walkers/determinants/AD tangents under ``vmap``.

* Complex arithmetic is **split into real/imag planes by hand**: XLA's complex
  lowering of the gather-heavy elimination measures ~3x slower than the explicit
  real-pair formulation at production shapes, so the public API is complex but every
  internal op is real.

* The local energy takes a **Hessian through log psi**, and differentiating through a
  pivoted elimination twice produces enormous graphs.  ``slogdet`` and ``solve``
  therefore carry custom JVP rules (``d logdet = tr(A^-1 dA)``;
  ``d solve = solve(A, db - dA x)``), defined recursively in terms of ``solve`` so
  that every AD order reuses triangular solves against the same factorisation instead
  of differentiating the elimination.  The pivot path is primal-only; XLA CSE merges
  repeated factorisations of the same matrix.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp


def _swap_rows(m: jnp.ndarray, i: int, p: jnp.ndarray, swapped: jnp.ndarray):
    row_i, row_p = m[i], m[p]
    m = m.at[i].set(jnp.where(swapped, row_p, row_i))
    return m.at[p].set(jnp.where(swapped, row_i, row_p))


def _lu_factor_split(ar: jnp.ndarray, ai: jnp.ndarray):
    """Split-real LU with partial pivoting for one tiny complex matrix.

    Returns:
        ``(lur, lui, perm, sign_re, sign_im, logdet)``: U on/above the diagonal and
        L multipliers below (unit diagonal implied), the row permutation, the
        determinant's unit phase and its log magnitude.
    """
    n = ar.shape[-1]
    rows = jnp.arange(n)
    perm = rows
    sr = jnp.ones(())
    si = jnp.zeros(())
    logdet = jnp.zeros(())

    for i in range(n):
        mag2 = ar[:, i] ** 2 + ai[:, i] ** 2
        masked = jnp.where(rows >= i, mag2, -1.0)
        p = jnp.argmax(masked)
        swapped = p != i

        ar = _swap_rows(ar, i, p, swapped)
        ai = _swap_rows(ai, i, p, swapped)
        perm_i, perm_p = perm[i], perm[p]
        perm = perm.at[i].set(jnp.where(swapped, perm_p, perm_i))
        perm = perm.at[p].set(jnp.where(swapped, perm_i, perm_p))
        flip = jnp.where(swapped, -1.0, 1.0)
        sr = sr * flip
        si = si * flip

        pr, pi_ = ar[i, i], ai[i, i]
        den = pr * pr + pi_ * pi_
        logdet = logdet + 0.5 * jnp.log(den)
        inv_abs = jax.lax.rsqrt(den)
        sr, si = (sr * pr - si * pi_) * inv_abs, (sr * pi_ + si * pr) * inv_abs

        # Multipliers a[r, i] / pivot for rows r > i.
        fr = jnp.where(rows > i, (ar[:, i] * pr + ai[:, i] * pi_) / den, 0)
        fi = jnp.where(rows > i, (ai[:, i] * pr - ar[:, i] * pi_) / den, 0)
        # Eliminate columns > i only; stored L-columns must not change.
        cm = (rows > i).astype(ar.dtype)
        ur, ui = ar[i] * cm, ai[i] * cm
        ar = ar - (fr[:, None] * ur[None] - fi[:, None] * ui[None])
        ai = ai - (fr[:, None] * ui[None] + fi[:, None] * ur[None])
        # Keep the multipliers in column i below the diagonal.
        ar = ar.at[:, i].set(jnp.where(rows > i, fr, ar[:, i]))
        ai = ai.at[:, i].set(jnp.where(rows > i, fi, ai[:, i]))

    return ar, ai, perm, sr, si, logdet


def _lu_factor_real(a: jnp.ndarray):
    """Real-matrix variant of :func:`_lu_factor_split`."""
    n = a.shape[-1]
    rows = jnp.arange(n)
    perm = rows
    sign = jnp.ones(())
    logdet = jnp.zeros(())

    for i in range(n):
        masked = jnp.where(rows >= i, jnp.abs(a[:, i]), -1.0)
        p = jnp.argmax(masked)
        swapped = p != i
        a = _swap_rows(a, i, p, swapped)
        perm_i, perm_p = perm[i], perm[p]
        perm = perm.at[i].set(jnp.where(swapped, perm_p, perm_i))
        perm = perm.at[p].set(jnp.where(swapped, perm_i, perm_p))
        sign = sign * jnp.where(swapped, -1.0, 1.0)

        pivot = a[i, i]
        logdet = logdet + jnp.log(jnp.abs(pivot))
        sign = sign * jnp.sign(pivot)
        f = jnp.where(rows > i, a[:, i] / pivot, 0)
        cm = (rows > i).astype(a.dtype)
        a = a - f[:, None] * (a[i] * cm)[None]
        a = a.at[:, i].set(jnp.where(rows > i, f, a[:, i]))

    return a, perm, sign, logdet


def _lu_apply_split(lur, lui, perm, br, bi):
    """Solve ``A x = b`` from a split factorisation. ``b``: [n, k] (real pair)."""
    n = lur.shape[-1]
    xr, xi = br[perm], bi[perm]
    for i in range(1, n):  # forward substitution (unit-diagonal L)
        xr = xr.at[i].add(-(lur[i, :i] @ xr[:i] - lui[i, :i] @ xi[:i]))
        xi = xi.at[i].add(-(lur[i, :i] @ xi[:i] + lui[i, :i] @ xr[:i]))
    for i in reversed(range(n)):  # back substitution (U)
        if i < n - 1:
            xr = xr.at[i].add(-(lur[i, i + 1 :] @ xr[i + 1 :] - lui[i, i + 1 :] @ xi[i + 1 :]))
            xi = xi.at[i].add(-(lur[i, i + 1 :] @ xi[i + 1 :] + lui[i, i + 1 :] @ xr[i + 1 :]))
        ur, ui = lur[i, i], lui[i, i]
        den = ur * ur + ui * ui
        xr_i = (xr[i] * ur + xi[i] * ui) / den
        xi_i = (xi[i] * ur - xr[i] * ui) / den
        xr = xr.at[i].set(xr_i)
        xi = xi.at[i].set(xi_i)
    return xr, xi


def _lu_apply_real(lu, perm, b):
    n = lu.shape[-1]
    x = b[perm]
    for i in range(1, n):
        x = x.at[i].add(-lu[i, :i] @ x[:i])
    for i in reversed(range(n)):
        if i < n - 1:
            x = x.at[i].add(-lu[i, i + 1 :] @ x[i + 1 :])
        x = x.at[i].mul(1 / lu[i, i])
    return x


@jax.custom_jvp
def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a @ x = b`` for tiny matrices (TPU-safe, complex-capable).

    ``a``: [n, n]; ``b``: [n, k] or [n]. Differentiable to any order via the custom
    JVP (the factorisation itself is primal-only).
    """
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    if jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        lur, lui, perm, *_ = _lu_factor_split(
            a.real, a.imag if jnp.iscomplexobj(a) else jnp.zeros_like(a.real)
        )
        br = b2.real
        bi = b2.imag if jnp.iscomplexobj(b2) else jnp.zeros_like(br)
        xr, xi = _lu_apply_split(lur, lui, perm, br, bi)
        x = xr + 1j * xi
    else:
        lu, perm, _, _ = _lu_factor_real(a)
        x = _lu_apply_real(lu, perm, b2)
    return x[:, 0] if vec else x


@solve.defjvp
def _solve_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    x = solve(a, b)
    dx = solve(a, db - da @ x)
    return x, dx


@jax.custom_jvp
def _slogdet_single(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    if jnp.iscomplexobj(a):
        _, _, _, sr, si, logdet = _lu_factor_split(a.real, a.imag)
        return sr + 1j * si, logdet
    _, _, sign, logdet = _lu_factor_real(a)
    return sign, logdet


@_slogdet_single.defjvp
def _slogdet_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    sign, logdet = _slogdet_single(a)
    # d logdet(A) = tr(A^-1 dA); real part moves |det|, imaginary part the phase.
    t = jnp.trace(solve(a, da.astype(a.dtype)))
    if jnp.iscomplexobj(a):
        d_logdet = t.real
        d_sign = sign * 1j * t.imag
    else:
        d_logdet = t
        d_sign = jnp.zeros_like(sign)
    return (sign, logdet), (d_sign, d_logdet)


def slogdet(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sign and log-magnitude of ``det(a)``; drop-in for ``jnp.linalg.slogdet``.

    Works for complex matrices on TPU; leading axes are batch axes.
    """
    n = a.shape[-1]
    if a.ndim > 2:
        batch_shape = a.shape[:-2]
        flat = a.reshape((-1, n, n))
        sign, logdet = jax.vmap(_slogdet_single)(flat)
        return sign.reshape(batch_shape), logdet.reshape(batch_shape)
    return _slogdet_single(a)


def signed_logsumdet(orbitals: jnp.ndarray) -> jnp.ndarray:
    """Complex log of a (sum of) determinant(s).

    Args:
        orbitals: ``[..., ndet, nelec, nelec]`` — the axis before the matrix axes is
            the determinant-expansion axis; any leading axes are batch axes.  A bare
            ``[nelec, nelec]`` input is treated as a single determinant.

    Returns:
        ``log sum_d det(orbitals_d)`` per batch element (complex), computed with the
        log-sum-exp trick over determinants for stability.
    """
    if orbitals.ndim == 2:
        orbitals = orbitals[None]
    signs, logdets = slogdet(orbitals)  # [..., ndet]
    logmax = jnp.max(logdets, axis=-1, keepdims=True)
    out = (
        jnp.log(jnp.sum(signs * jnp.exp(logdets - logmax), axis=-1))
        + logmax[..., 0]
    )
    return out

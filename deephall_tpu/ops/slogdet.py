"""Complex determinant evaluation for wavefunctions.

The wavefunction is a (sum of) complex determinant(s) of tiny ``[nelec, nelec]``
matrices, evaluated in log space (reference ``psiformer.py:72-76``,
``laughlin.py:53-57``).

TPU notes:

* XLA's LAPACK-style complex LU (``jnp.linalg.slogdet``) is not implemented on the TPU
  backend, so this module carries its own complex LU with partial pivoting, written as
  an unrolled sequence of elementwise jnp ops.  Complex arithmetic lowers to real VPU
  pairs; ``nelec`` is tiny (<= ~16) so the O(N) unrolled steps of O(N^2) vector work
  stay in registers/VMEM and batch over walkers/determinants/AD tangents under
  ``vmap``.

* The local energy takes a **Hessian through log psi**, and differentiating through a
  pivoted elimination twice produces enormous graphs.  ``slogdet`` and ``solve``
  therefore carry custom JVP rules (``d logdet = tr(A^-1 dA)``;
  ``d solve = solve(A, db - dA x)``), defined recursively in terms of ``solve`` so
  that every AD order reuses triangular solves against the same factorisation instead
  of differentiating the elimination.  The pivot path is primal-only.  XLA CSE merges
  the repeated factorisations of the same matrix.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp


def _lu_factor(a: jnp.ndarray):
    """Unrolled LU with partial pivoting for one tiny square matrix.

    Returns:
        ``(lu, perm, sign, logdet)`` where ``lu`` holds U on/above the diagonal and
        the L multipliers below (unit diagonal implied), ``perm`` is the row
        permutation applied to the input, ``sign`` the determinant's unit-modulus
        phase (including permutation parity) and ``logdet`` the log magnitude.
    """
    n = a.shape[-1]
    rows = jnp.arange(n)
    perm = rows
    sign = jnp.ones((), dtype=a.dtype)
    logdet = jnp.zeros((), dtype=jnp.float32 if a.dtype != jnp.float64 else a.dtype)

    for i in range(n):
        col = jnp.abs(a[:, i])
        masked = jnp.where(rows >= i, col, -jnp.inf)
        p = jnp.argmax(masked)

        # Swap rows i and p of both the working matrix and the L-multiplier part.
        row_i, row_p = a[i], a[p]
        swapped = p != i
        a = a.at[i].set(jnp.where(swapped, row_p, row_i))
        a = a.at[p].set(jnp.where(swapped, row_i, row_p))
        perm_i, perm_p = perm[i], perm[p]
        perm = perm.at[i].set(jnp.where(swapped, perm_p, perm_i))
        perm = perm.at[p].set(jnp.where(swapped, perm_i, perm_p))
        sign = sign * jnp.where(swapped, -1.0, 1.0)

        pivot = a[i, i]
        abs_pivot = jnp.abs(pivot)
        logdet = logdet + jnp.log(abs_pivot)
        sign = sign * pivot / abs_pivot

        # Store multipliers below the pivot and eliminate columns > i only
        # (columns < i hold already-stored L multipliers and must not change).
        factor = jnp.where(rows > i, a[:, i] / pivot, 0)
        col_mask = (rows > i).astype(a.real.dtype)
        elim = a - factor[:, None] * (a[i] * col_mask)[None, :]
        # Keep the multipliers in column i below the diagonal (L part).
        a = elim.at[:, i].set(jnp.where(rows > i, factor, a[:, i]))

    return a, perm, sign, logdet


def _lu_apply(lu: jnp.ndarray, perm: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given the factorisation of one matrix. ``b``: [n, k]."""
    n = lu.shape[-1]
    x = b[perm]
    # Forward substitution (L, unit diagonal).
    for i in range(1, n):
        x = x.at[i].add(-lu[i, :i] @ x[:i])
    # Back substitution (U).
    for i in reversed(range(n)):
        if i < n - 1:
            x = x.at[i].add(-lu[i, i + 1 :] @ x[i + 1 :])
        x = x.at[i].mul(1 / lu[i, i])
    return x


@jax.custom_jvp
def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a @ x = b`` for tiny matrices (TPU-safe, complex-capable).

    ``a``: [n, n]; ``b``: [n, k] or [n]. Differentiable to any order via the custom
    JVP below (the factorisation itself is primal-only).
    """
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    lu, perm, _, _ = _lu_factor(a)
    x = _lu_apply(lu, perm, b2.astype(lu.dtype))
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
    _, _, sign, logdet = _lu_factor(a)
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
        orbitals: ``[nelec, nelec]`` for a single determinant or
            ``[ndet, nelec, nelec]`` for a determinant expansion.

    Returns:
        ``log sum_d det(orbitals_d)`` as a complex scalar, computed with the
        log-sum-exp trick over determinants for stability.
    """
    signs, logdets = slogdet(orbitals)
    logmax = jnp.max(logdets)
    return jnp.log(jnp.sum(signs * jnp.exp(logdets - logmax))) + logmax

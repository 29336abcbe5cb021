"""Complex determinant evaluation for wavefunctions.

The wavefunction is a (sum of) complex determinant(s) of tiny ``[nelec, nelec]``
matrices, evaluated in log space (reference ``psiformer.py:72-76``,
``laughlin.py:53-57``).

TPU notes:

* XLA's LAPACK-style complex LU (``jnp.linalg.slogdet``) is not implemented on the TPU
  backend, so this module carries its own unrolled partial-pivot elimination.
  ``nelec`` is tiny (<= ~16), so the O(N) unrolled steps of O(N^2) vector work stay in
  registers/VMEM and batch over walkers/determinants/AD tangents.

* The elimination is **batched-native and gather-free**: all leading axes are batch
  axes, pivot rows are selected with one-hot masked reductions and row swaps are
  rebuilt with ``where`` masks instead of per-matrix dynamic indexing.  (An earlier
  per-matrix variant lifted through ``vmap`` lowered to per-walker gathers/scatters,
  which dominate the forward pass at production batch sizes.)

* Complex arithmetic is **split into real/imag planes by hand**: XLA's complex
  lowering of this code measures ~3x slower than the explicit real-pair formulation
  at production shapes, so the public API is complex but every internal op is real.

* The local energy takes a **Hessian through log psi**, and differentiating through a
  pivoted elimination twice produces enormous graphs.  ``slogdet`` and ``solve``
  therefore carry custom JVP rules (``d logdet = tr(A^-1 dA)``;
  ``d solve = solve(A, db - dA x)``), defined recursively in terms of ``solve`` so
  that every AD order reuses solves against the same elimination instead of
  differentiating it.  The pivot path is primal-only.

* :func:`slogdet_solve` fuses the determinant and a multi-RHS solve into one
  elimination (the RHS is carried through the row operations, so no L factor or
  permutation is ever materialised) — used by the forward-Laplacian pipeline, which
  needs ``log det`` and ``A^-1 [J L D]`` of the same matrices.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp


def _eliminate_split(ar, ai, br, bi):
    """Partial-pivot elimination on split-real batches, RHS carried along.

    Args:
        ar, ai: ``[*, n, n]`` real/imag parts of the matrices.
        br, bi: ``[*, n, k]`` real/imag RHS (or ``None`` for determinant only).

    Returns:
        ``(ur, ui, br, bi, sign_re, sign_im, logdet)``: the upper triangle of the
        eliminated matrix (lower triangle is garbage, never read), the
        forward-substituted RHS, and the determinant's unit phase / log magnitude.
    """
    n = ar.shape[-1]
    rows = jnp.arange(n)
    batch = ar.shape[:-2]
    sr = jnp.ones(batch, ar.dtype)
    si = jnp.zeros(batch, ar.dtype)
    logdet = jnp.zeros(batch, ar.dtype)

    for i in range(n):
        col_r, col_i = ar[..., :, i], ai[..., :, i]
        mag2 = col_r**2 + col_i**2  # [*, n]
        p = jnp.argmax(jnp.where(rows >= i, mag2, -1.0), axis=-1)  # [*]
        sel_p = (rows == p[..., None])[..., None]  # [*, n, 1]
        is_i = (rows == i)[:, None]  # [n, 1]

        def swap(m, sel_p=sel_p, is_i=is_i):
            # Row i <- row p, row p <- row i (no-op when p == i), via masks.
            row_p = jnp.sum(jnp.where(sel_p, m, 0), axis=-2, keepdims=True)
            row_i = m[..., i : i + 1, :]
            return jnp.where(is_i, row_p, jnp.where(sel_p, row_i, m))

        ar, ai = swap(ar), swap(ai)
        if br is not None:
            br, bi = swap(br), swap(bi)

        flip = jnp.where(p == i, 1.0, -1.0)
        pr, pi_ = ar[..., i, i], ai[..., i, i]
        den = pr * pr + pi_ * pi_
        logdet = logdet + 0.5 * jnp.log(den)
        inv_abs = jax.lax.rsqrt(den)
        sr, si = (
            flip * (sr * pr - si * pi_) * inv_abs,
            flip * (sr * pi_ + si * pr) * inv_abs,
        )

        # Multipliers for rows below the pivot; eliminate columns > i (and the RHS).
        below = rows > i
        pr_c, pi_c, den_c = pr[..., None], pi_[..., None], den[..., None]
        fr = jnp.where(below, (ar[..., :, i] * pr_c + ai[..., :, i] * pi_c) / den_c, 0)
        fi = jnp.where(below, (ai[..., :, i] * pr_c - ar[..., :, i] * pi_c) / den_c, 0)
        cm = below.astype(ar.dtype)
        ur_, ui_ = ar[..., i, :] * cm, ai[..., i, :] * cm
        ar = ar - (
            fr[..., :, None] * ur_[..., None, :] - fi[..., :, None] * ui_[..., None, :]
        )
        ai = ai - (
            fr[..., :, None] * ui_[..., None, :] + fi[..., :, None] * ur_[..., None, :]
        )
        if br is not None:
            row_br, row_bi = br[..., i, :], bi[..., i, :]
            br = br - (
                fr[..., :, None] * row_br[..., None, :]
                - fi[..., :, None] * row_bi[..., None, :]
            )
            bi = bi - (
                fr[..., :, None] * row_bi[..., None, :]
                + fi[..., :, None] * row_br[..., None, :]
            )

    return ar, ai, br, bi, sr, si, logdet


def _back_substitute_split(ur, ui, br, bi):
    """Solve ``U x = b`` for upper-triangular split-real ``U``; ``b``: [*, n, k]."""
    n = ur.shape[-1]
    xr = jnp.zeros_like(br)
    xi = jnp.zeros_like(bi)
    for i in reversed(range(n)):
        acc_r, acc_i = br[..., i, :], bi[..., i, :]
        if i < n - 1:
            u_r = ur[..., i, i + 1 :]
            u_i = ui[..., i, i + 1 :]
            tail_r = xr[..., i + 1 :, :]
            tail_i = xi[..., i + 1 :, :]
            acc_r = acc_r - (
                jnp.einsum("...j,...jk->...k", u_r, tail_r)
                - jnp.einsum("...j,...jk->...k", u_i, tail_i)
            )
            acc_i = acc_i - (
                jnp.einsum("...j,...jk->...k", u_r, tail_i)
                + jnp.einsum("...j,...jk->...k", u_i, tail_r)
            )
        dr, di = ur[..., i, i, None], ui[..., i, i, None]
        den = dr * dr + di * di
        xr = xr.at[..., i, :].set((acc_r * dr + acc_i * di) / den)
        xi = xi.at[..., i, :].set((acc_i * dr - acc_r * di) / den)
    return xr, xi


def _eliminate_real(a, b):
    """Real-matrix variant of :func:`_eliminate_split`."""
    n = a.shape[-1]
    rows = jnp.arange(n)
    batch = a.shape[:-2]
    sign = jnp.ones(batch, a.dtype)
    logdet = jnp.zeros(batch, a.dtype)

    for i in range(n):
        p = jnp.argmax(jnp.where(rows >= i, jnp.abs(a[..., :, i]), -1.0), axis=-1)
        sel_p = (rows == p[..., None])[..., None]
        is_i = (rows == i)[:, None]

        def swap(m, sel_p=sel_p, is_i=is_i):
            row_p = jnp.sum(jnp.where(sel_p, m, 0), axis=-2, keepdims=True)
            row_i = m[..., i : i + 1, :]
            return jnp.where(is_i, row_p, jnp.where(sel_p, row_i, m))

        a = swap(a)
        if b is not None:
            b = swap(b)

        pivot = a[..., i, i]
        sign = sign * jnp.where(p == i, 1.0, -1.0) * jnp.sign(pivot)
        logdet = logdet + jnp.log(jnp.abs(pivot))
        below = rows > i
        f = jnp.where(below, a[..., :, i] / pivot[..., None], 0)
        u_ = a[..., i, :] * below.astype(a.dtype)
        a = a - f[..., :, None] * u_[..., None, :]
        if b is not None:
            b = b - f[..., :, None] * b[..., i, :][..., None, :]

    return a, b, sign, logdet


def _back_substitute_real(u, b):
    n = u.shape[-1]
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        acc = b[..., i, :]
        if i < n - 1:
            acc = acc - jnp.einsum(
                "...j,...jk->...k", u[..., i, i + 1 :], x[..., i + 1 :, :]
            )
        x = x.at[..., i, :].set(acc / u[..., i, i, None])
    return x


def _split(z):
    if jnp.iscomplexobj(z):
        return z.real, z.imag
    return z, jnp.zeros_like(z)


def _is_vector_rhs(a: jnp.ndarray, b: jnp.ndarray) -> bool:
    """True iff ``b`` is a stack of vectors ``[*, n]`` matching ``a``'s batch dims.

    An unbatched matrix RHS ``[n, k]`` paired with a batched ``a`` ``[*, n, n]``
    has ``b.ndim == a.ndim - 1`` too; requiring ``b.shape[-1] == n`` rejects it
    loudly instead of silently treating it as vectors (broadcast ``b`` to ``a``'s
    batch shape explicitly in that case). The ``k == n`` corner stays ambiguous
    by construction: ``b``'s batch dims must match ``a``'s.
    """
    if b.ndim != a.ndim - 1:
        return False
    if b.shape[-1] != a.shape[-1]:
        raise ValueError(
            f"solve: rhs shape {b.shape} is neither a vector stack matching "
            f"a {a.shape} nor a matrix stack; broadcast b to a's batch shape."
        )
    return True


@jax.custom_jvp
def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a @ x = b`` for tiny matrices (TPU-safe, complex-capable, batched).

    ``a``: [*, n, n]; ``b``: [*, n, k] or [*, n]. Leading axes are batch axes and
    must match between ``a`` and ``b`` (see ``_is_vector_rhs``).
    Differentiable to any order via the custom JVP (the elimination is primal-only).
    """
    vec = _is_vector_rhs(a, b)
    b2 = b[..., None] if vec else b
    if jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        ar, ai = _split(a)
        br, bi = _split(b2)
        ur, ui, br, bi, *_ = _eliminate_split(ar, ai, br, bi)
        xr, xi = _back_substitute_split(ur, ui, br, bi)
        x = xr + 1j * xi
    else:
        u, b2, _, _ = _eliminate_real(a, b2)
        x = _back_substitute_real(u, b2)
    return x[..., 0] if vec else x


@solve.defjvp
def _solve_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    x = solve(a, b)
    if _is_vector_rhs(a, b):
        dx = solve(a, db - jnp.einsum("...ij,...j->...i", da, x))
    else:
        dx = solve(a, db - da @ x)
    return x, dx


@jax.custom_jvp
def slogdet(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sign and log-magnitude of ``det(a)``; drop-in for ``jnp.linalg.slogdet``.

    Works for complex matrices on TPU; leading axes are batch axes.
    """
    if jnp.iscomplexobj(a):
        _, _, _, _, sr, si, logdet = _eliminate_split(a.real, a.imag, None, None)
        return sr + 1j * si, logdet
    _, _, sign, logdet = _eliminate_real(a, None)
    return sign, logdet


@slogdet.defjvp
def _slogdet_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    sign, logdet = slogdet(a)
    # d logdet(A) = tr(A^-1 dA); real part moves |det|, imaginary part the phase.
    t = jnp.trace(solve(a, da.astype(a.dtype)), axis1=-2, axis2=-1)
    if jnp.iscomplexobj(a):
        d_logdet = t.real
        d_sign = sign * 1j * t.imag
    else:
        d_logdet = t
        d_sign = jnp.zeros_like(sign)
    return (sign, logdet), (d_sign, d_logdet)


def slogdet_solve(
    a: jnp.ndarray, b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ``(sign, log|det a|, a^-1 b)`` from a single elimination.

    Primal-only (no AD rules): used by the forward-Laplacian pipeline, which
    consumes determinant and solves of the same matrices and performs no further
    differentiation.  ``b``: [*, n, k].
    """
    if jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        ar, ai = _split(a)
        br, bi = _split(b)
        ur, ui, br, bi, sr, si, logdet = _eliminate_split(ar, ai, br, bi)
        xr, xi = _back_substitute_split(ur, ui, br, bi)
        return sr + 1j * si, logdet, xr + 1j * xi
    u, b2, sign, logdet = _eliminate_real(a, b)
    return sign, logdet, _back_substitute_real(u, b2)


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

"""Complex determinant evaluation for wavefunctions.

The wavefunction is a (sum of) complex determinant(s) of tiny ``[nelec, nelec]``
matrices, evaluated in log space (reference ``psiformer.py:72-76``,
``laughlin.py:53-57``).

TPU note: XLA's LAPACK-style complex LU (``jnp.linalg.slogdet``) is not implemented on
the TPU backend, so this module carries its own complex LU with partial pivoting,
written as an unrolled sequence of elementwise jnp ops.  Complex arithmetic lowers to
real VPU pairs, every step is batched over walkers/determinants/AD tangents by ``vmap``,
and the whole factorisation is differentiable to second order (needed because the local
energy takes a Hessian through log-psi).  ``nelec`` is tiny (<= ~16), so the unrolled
O(N) steps of O(N^2) vector work compile quickly and stay in registers/VMEM.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp


def slogdet(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sign and log-magnitude of ``det(a)`` for one or more square matrices.

    A drop-in for ``jnp.linalg.slogdet`` that works for complex matrices on TPU.
    Leading axes are batch axes.

    Args:
        a: ``[..., n, n]`` real or complex matrix.

    Returns:
        ``(sign, logabsdet)`` where ``sign`` is a unit-modulus complex (or +-1 real)
        scalar per matrix and ``logabsdet`` is real.
    """
    n = a.shape[-1]
    if a.ndim > 2:
        batch_shape = a.shape[:-2]
        flat = a.reshape((-1, n, n))
        sign, logdet = jax.vmap(_slogdet_single)(flat)
        return sign.reshape(batch_shape), logdet.reshape(batch_shape)
    return _slogdet_single(a)


def _slogdet_single(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unrolled LU with partial pivoting for a single tiny square matrix."""
    n = a.shape[-1]
    rows = jnp.arange(n)
    sign = jnp.ones((), dtype=a.dtype)
    logdet = jnp.zeros((), dtype=jnp.float32 if a.dtype != jnp.float64 else a.dtype)

    for i in range(n):
        col = a[:, i]
        mags = jnp.abs(col)
        # Select the pivot among rows >= i.
        masked = jnp.where(rows >= i, mags, -jnp.inf)
        p = jnp.argmax(masked)

        # Swap rows i and p (no-op when p == i); each swap flips the sign.
        row_i = a[i]
        row_p = a[p]
        swapped = p != i
        a = a.at[i].set(jnp.where(swapped, row_p, row_i))
        a = a.at[p].set(jnp.where(swapped, row_i, row_p))
        sign = sign * jnp.where(swapped, -1.0, 1.0)

        pivot = a[i, i]
        abs_pivot = jnp.abs(pivot)
        logdet = logdet + jnp.log(abs_pivot)
        sign = sign * pivot / abs_pivot

        # Eliminate the column below the pivot; rows <= i stay untouched.
        factor = jnp.where(rows > i, a[:, i] / pivot, 0)
        a = a - factor[:, None] * a[i][None, :]

    return sign, logdet


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

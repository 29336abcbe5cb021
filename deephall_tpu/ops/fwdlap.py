"""Forward-Laplacian jet propagation for local-energy evaluation.

The local energy needs, per walker, the complex gradient of log psi plus three
second-derivative reductions: the (metric-weighted) Laplacian
``sum_i [d^2/dtheta_i^2 + (1/sin^2 theta_i) d^2/dphi_i^2]``, the all-phi directional
second derivative ``(sum_i d/dphi_i)^2`` (for Lz^2), and — only when the L^2
observable is requested — the full ``(N,2,N,2)`` Hessian.

The reference obtains all of these from ``jax.hessian`` sweeps
(``/root/reference/deephall/hamiltonian.py:105-114``): one linearization plus 2N
forward-over-reverse tangent passes, each of which re-traverses the network's
backward graph.  This module instead propagates a **second-order jet** through a
single forward pass (the forward-Laplacian technique of arXiv:2307.08214, rebuilt
here for TPU): every intermediate activation carries

* ``x``   — the primal value,
* ``j``   — ``K+1`` directional first derivatives (the seed directions are the
  2N coordinate directions, with the phi columns pre-scaled by ``1/sin theta`` so
  the Laplacian comes out in the sphere metric, plus one extra ``sum_i d/dphi_i``
  direction for Lz^2),
* ``l``   — the summed second directional derivative over the first K directions,
* ``d``   — the second directional derivative along the last (phi-sum) direction.

Propagation rules compose from four primitives: linear maps (applied verbatim to
every channel), elementwise functions (first/second derivatives taken pointwise
with nested ``jax.jvp`` — no hand-derived tables), bilinear contractions (product
rule with a cross term over tangent channels), and closed-form input functions
(seeded directly with nested ``jax.jvp``).  Determinants get a custom rule in
terms of triangular solves against the primal LU (``ops.slogdet.solve``):

    d   log det A = tr(A^-1 dA)
    d^2 log det A = tr(A^-1 d^2 A) - tr((A^-1 dA)^2)

Everything is one big batched forward pass: dense layers see ``[(K+1)*B*T, D]``
matmuls (MXU-shaped), there are no reverse sweeps and no stored residuals, and
XLA fuses the channel arithmetic into the surrounding ops.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

import jax
from jax import numpy as jnp

from deephall_tpu.ops.slogdet import slogdet_solve


class Jet(NamedTuple):
    """Second-order jet of an intermediate value along K+1 seed directions."""

    x: jnp.ndarray  # [*S] primal
    j: jnp.ndarray  # [K+1, *S] directional first derivatives
    l: jnp.ndarray  # [*S] sum of second directional derivatives over dirs 0..K-1
    d: jnp.ndarray  # [*S] second directional derivative along direction K


def add(a: Jet, b: Jet) -> Jet:
    """Jet of ``a + b`` (all channels add; broadcasting allowed)."""
    return Jet(a.x + b.x, a.j + b.j, a.l + b.l, a.d + b.d)


def shift(t: Jet, c: jnp.ndarray) -> Jet:
    """Jet of ``x + c`` for a constant ``c`` (derivative channels unchanged)."""
    return Jet(t.x + c, t.j, t.l, t.d)


def linear(f: Callable[[jnp.ndarray], jnp.ndarray], t: Jet, bias=None) -> Jet:
    """Jet of a linear map.

    ``f`` must act on trailing axes only (tensordot/reshape/moveaxis with negative
    axes), so it applies unchanged to the channel-stacked ``j``.
    """
    x = f(t.x)
    if bias is not None:
        x = x + bias
    return Jet(x, f(t.j), f(t.l), f(t.d))


def elementwise(f: Callable[[jnp.ndarray], jnp.ndarray], t: Jet) -> Jet:
    """Jet of a pointwise (holomorphic, if complex) function.

    First and second pointwise derivatives are extracted with nested ``jax.jvp``
    against a ones tangent, so no per-function derivative table is needed.
    """
    ones = jnp.ones_like(t.x)
    x = f(t.x)
    _, f1 = jax.jvp(f, (t.x,), (ones,))
    _, f2 = jax.jvp(
        lambda y: jax.jvp(f, (y,), (jnp.ones_like(y),))[1], (t.x,), (ones,)
    )
    jsq = jnp.sum(jnp.square(t.j[:-1]), axis=0)
    return Jet(
        x, f1 * t.j, f1 * t.l + f2 * jsq, f1 * t.d + f2 * jnp.square(t.j[-1])
    )


def bilinear(f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], a: Jet, b: Jet) -> Jet:
    """Jet of a bilinear contraction ``f(a, b)`` (product rule + tangent cross term).

    ``f`` must be written with leading-batch-friendly broadcasting (``...`` einsum
    patterns or plain elementwise arithmetic on trailing axes).
    """
    x = f(a.x, b.x)
    j = f(a.j, b.x[None]) + f(a.x[None], b.j)
    cross = f(a.j[:-1], b.j[:-1])
    l = f(a.l, b.x) + f(a.x, b.l) + 2 * jnp.sum(cross, axis=0)
    d = f(a.d, b.x) + f(a.x, b.d) + 2 * f(a.j[-1], b.j[-1])
    return Jet(x, j, l, d)


def jet_of_fn(f: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray, seeds: jnp.ndarray) -> Jet:
    """Seed a jet through a closed-form function with nested ``jax.jvp``.

    Used for the input-side functions (input features, monopole envelope, Jastrow)
    whose exact directional derivatives are cheap to take directly.

    Args:
        f: Function of the electron configuration.
        x: ``[*B, N, 2]`` configurations.
        seeds: ``[K+1, *B, N, 2]`` tangent directions.
    """

    def d1(v):
        return jax.jvp(f, (x,), (v,))[1]

    def d2(v):
        return jax.jvp(lambda y: jax.jvp(f, (y,), (v,))[1], (x,), (v,))[1]

    j = jax.vmap(d1)(seeds)
    h = jax.vmap(d2)(seeds)
    return Jet(f(x), j, jnp.sum(h[:-1], axis=0), h[-1])


def electron_seeds(data: jnp.ndarray) -> jnp.ndarray:
    """Seed directions for the sphere-metric Laplacian plus the Lz^2 direction.

    Directions ``k = 2*i`` are ``e_theta_i``; ``k = 2*i + 1`` are
    ``e_phi_i / sin(theta_i)`` (per-walker scaling, so the summed second
    derivative lands directly in the sphere metric); the final direction is
    ``sum_i e_phi_i`` (unscaled), whose second derivative gives ``Lz^2``.

    Args:
        data: ``[*B, N, 2]`` electron configurations.

    Returns:
        ``[2N+1, *B, N, 2]`` seed tangents.
    """
    theta = data[..., 0]
    n = data.shape[-2]
    batch_ndim = data.ndim - 2
    eye = jnp.eye(2 * n).reshape((2 * n,) + (1,) * batch_ndim + (n, 2))
    scale = jnp.stack([jnp.ones_like(theta), 1.0 / jnp.sin(theta)], axis=-1)
    coord_seeds = eye * scale  # [2N, *B, N, 2]
    u = jnp.broadcast_to(
        jnp.stack([jnp.zeros_like(theta), jnp.ones_like(theta)], axis=-1), data.shape
    )
    return jnp.concatenate([coord_seeds, u[None]], axis=0)


def logsumdet_jet(t: Jet) -> Jet:
    """Jet of ``log sum_d det(Phi_d)`` from the jet of the orbital matrices.

    ``t.x``: ``[*B, ndet, n, n]`` complex.  All derivative channels are solved
    against one LU factorisation per (walker, determinant): the channel RHS
    columns are concatenated into a single multi-RHS ``solve`` call.
    """
    phi = t.x
    *batch, ndet, n, _ = phi.shape
    kp1 = t.j.shape[0]

    # [kp1, *B, ndet, n, n] -> [*B, ndet, n, kp1*n] column blocks.
    j_cols = jnp.moveaxis(t.j, 0, -2).reshape(*phi.shape[:-1], kp1 * n)
    rhs = jnp.concatenate([j_cols, t.l, t.d], axis=-1)  # [*B, ndet, n, (kp1+2)n]

    # One elimination per (walker, determinant) yields the determinant and every
    # channel's solve together.
    sign, logabs, m = slogdet_solve(phi, rhs)

    mj = m[..., : kp1 * n].reshape(*phi.shape[:-1], kp1, n)
    mj = jnp.moveaxis(mj, -2, 0)  # [kp1, *B, ndet, n, n]
    ml = m[..., kp1 * n : (kp1 + 1) * n]
    md = m[..., (kp1 + 1) * n :]

    jz = jnp.trace(mj, axis1=-2, axis2=-1)  # [kp1, *B, ndet]
    # tr((A^-1 dA)^2) per direction; summed over the Laplacian directions.
    sq = jnp.einsum("k...ij,k...ji->k...", mj[:-1], mj[:-1])
    lz = jnp.trace(ml, axis1=-2, axis2=-1) - jnp.sum(sq, axis=0)
    dz = jnp.trace(md, axis1=-2, axis2=-1) - jnp.einsum(
        "...ij,...ji->...", mj[-1], mj[-1]
    )

    z = Jet(logabs + jnp.log(sign), jz, lz, dz)

    # log-sum-exp over determinants; the shift is a constant and cancels exactly.
    c = jnp.max(z.x.real, axis=-1, keepdims=True)
    e = elementwise(jnp.exp, shift(z, -c))
    s = linear(lambda v: jnp.sum(v, axis=-1), e)
    out = elementwise(jnp.log, s)
    return shift(out, c[..., 0])

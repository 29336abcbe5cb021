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
here for TPU): every intermediate activation carries the primal value ``x`` plus a
single **packed tangent block** ``t`` of ``K+3`` channels, where ``K = 2N``:

* rows ``0..K``   — directional first derivatives (the seed directions are the 2N
  coordinate directions, with the phi columns pre-scaled by ``1/sin theta`` so the
  Laplacian comes out in the sphere metric, plus one extra ``sum_i d/dphi_i``
  direction for Lz^2),
* row ``K+1``     — the summed second directional derivative over the first K
  directions (the metric Laplacian channel),
* row ``K+2``     — the second directional derivative along the Lz^2 direction.

Packing matters on TPU: linear layers and pointwise channel arithmetic see ONE
``[(K+3)*B*T, D]`` tensor instead of three or four separately-scheduled ops, so XLA
tiles one large matmul onto the MXU and fuses the channel arithmetic once.  The
second-order rows differ from the first-order rows only by *additive* curvature
corrections, applied with static-index ``.at[-2:].add`` updates.

Propagation rules compose from four primitives: linear maps (applied verbatim to
the packed block), elementwise functions (first/second derivatives taken pointwise
with nested ``jax.jvp`` — no hand-derived tables), bilinear contractions (product
rule on the block plus a cross term over tangent rows), and closed-form input
functions (seeded directly with nested ``jax.jvp``).  Determinants get a custom
rule in terms of triangular solves against the primal LU (``ops.slogdet.solve``):

    d   log det A = tr(A^-1 dA)
    d^2 log det A = tr(A^-1 d^2 A) - tr((A^-1 dA)^2)

Everything is one big batched forward pass: there are no reverse sweeps and no
stored residuals, and XLA fuses the channel arithmetic into the surrounding ops.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

import jax
from jax import numpy as jnp

from deephall_tpu.ops.slogdet import slogdet_solve


class Jet(NamedTuple):
    """Second-order jet: primal ``x`` plus the packed ``[K+3, *S]`` tangent block.

    Rows of ``t``: ``0..K`` directional first derivatives (K+1 of them), ``K+1``
    the summed second derivative over directions ``0..K-1``, ``K+2`` the second
    derivative along direction ``K``.  The ``j``/``l``/``d`` properties expose the
    unpacked view for consumers (the Hamiltonian reads first derivatives and the
    two curvature channels separately).
    """

    x: jnp.ndarray  # [*S] primal
    t: jnp.ndarray  # [K+3, *S] packed tangent block

    @property
    def j(self) -> jnp.ndarray:
        """Directional first derivatives, ``[K+1, *S]``."""
        return self.t[:-2]

    @property
    def l(self) -> jnp.ndarray:  # noqa: E743 - matches the math (Laplacian)
        """Summed second directional derivative over directions ``0..K-1``."""
        return self.t[-2]

    @property
    def d(self) -> jnp.ndarray:
        """Second directional derivative along direction ``K`` (the Lz^2 seed)."""
        return self.t[-1]


def add(a: Jet, b: Jet) -> Jet:
    """Jet of ``a + b`` (all channels add; broadcasting allowed)."""
    return Jet(a.x + b.x, a.t + b.t)


def shift(t: Jet, c: jnp.ndarray) -> Jet:
    """Jet of ``x + c`` for a constant ``c`` (derivative channels unchanged)."""
    return Jet(t.x + c, t.t)


def linear(f: Callable[[jnp.ndarray], jnp.ndarray], t: Jet, bias=None) -> Jet:
    """Jet of a linear map.

    ``f`` must act on trailing axes only (tensordot/reshape/moveaxis with negative
    axes), so it applies unchanged to the packed channel block — one call for all
    K+3 tangent channels.
    """
    x = f(t.x)
    if bias is not None:
        x = x + bias
    return Jet(x, f(t.t))


def elementwise(f: Callable[[jnp.ndarray], jnp.ndarray], t: Jet) -> Jet:
    """Jet of a pointwise (holomorphic, if complex) function.

    First and second pointwise derivatives are extracted with nested ``jax.jvp``
    against a ones tangent, so no per-function derivative table is needed.  The
    chain rule scales the whole block by ``f'``; the curvature rows additionally
    pick up ``f'' * (first-derivative row)^2`` terms.
    """
    ones = jnp.ones_like(t.x)
    x = f(t.x)
    _, f1 = jax.jvp(f, (t.x,), (ones,))
    _, f2 = jax.jvp(
        lambda y: jax.jvp(f, (y,), (jnp.ones_like(y),))[1], (t.x,), (ones,)
    )
    jsq = jnp.sum(jnp.square(t.t[:-3]), axis=0)  # Laplacian directions
    out = f1 * t.t
    out = out.at[-2].add(f2 * jsq).at[-1].add(f2 * jnp.square(t.t[-3]))
    return Jet(x, out)


def bilinear(f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], a: Jet, b: Jet) -> Jet:
    """Jet of a bilinear contraction ``f(a, b)`` (product rule + tangent cross term).

    ``f`` must be written with leading-batch-friendly broadcasting (``...`` einsum
    patterns or plain elementwise arithmetic on trailing axes).
    """
    x = f(a.x, b.x)
    out = f(a.t, b.x[None]) + f(a.x[None], b.t)
    cross_l = 2 * jnp.sum(f(a.t[:-3], b.t[:-3]), axis=0)
    cross_d = 2 * f(a.t[-3], b.t[-3])
    out = out.at[-2].add(cross_l).at[-1].add(cross_d)
    return Jet(x, out)


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
    t = jnp.concatenate([j, jnp.sum(h[:-1], axis=0)[None], h[-1:]], axis=0)
    return Jet(f(x), t)


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

    ``t.x``: ``[*B, ndet, n, n]`` complex.  All K+3 channels are solved against
    one LU factorisation per (walker, determinant): the packed block's matrices
    become the columns of a single multi-RHS ``solve`` call.
    """
    phi = t.x
    n = phi.shape[-1]
    kp3 = t.t.shape[0]

    # [kp3, *B, ndet, n, n] -> [*B, ndet, n, kp3*n] column blocks.
    cols = jnp.moveaxis(t.t, 0, -2).reshape(*phi.shape[:-1], kp3 * n)

    # One elimination per (walker, determinant) yields the determinant and every
    # channel's solve together.
    sign, logabs, m = slogdet_solve(phi, cols)

    mall = jnp.moveaxis(
        m.reshape(*phi.shape[:-1], kp3, n), -2, 0
    )  # [kp3, *B, ndet, n, n]

    # tr(A^-1 dA) per channel: first derivatives for the j rows, tr(A^-1 L) /
    # tr(A^-1 D) for the curvature rows.
    tr = jnp.trace(mall, axis1=-2, axis2=-1)  # [kp3, *B, ndet]
    # Curvature corrections: - tr((A^-1 dA)^2), summed over the Laplacian
    # directions for the l row, along the Lz^2 direction for the d row.
    sq = jnp.einsum("k...ij,k...ji->k...", mall[:-3], mall[:-3])
    tr = tr.at[-2].add(-jnp.sum(sq, axis=0)).at[-1].add(
        -jnp.einsum("...ij,...ji->...", mall[-3], mall[-3])
    )

    z = Jet(logabs + jnp.log(sign), tr)

    # log-sum-exp over determinants; the shift is a constant and cancels exactly.
    c = jnp.max(z.x.real, axis=-1, keepdims=True)
    e = elementwise(jnp.exp, shift(z, -c))
    s = linear(lambda v: jnp.sum(v, axis=-1), e)
    out = elementwise(jnp.log, s)
    return shift(out, c[..., 0])

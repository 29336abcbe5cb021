"""Forward-Laplacian jet propagation for local-energy evaluation.

The local energy needs, per walker, the complex gradient of log psi plus
second-derivative reductions: the (metric-weighted) Laplacian
``sum_i [d^2/dtheta_i^2 + (1/sin^2 theta_i) d^2/dphi_i^2]`` and a handful of
**directional** second derivatives — the all-phi direction ``(sum_i d/dphi_i)^2``
for Lz^2, and (when the L^2 observable is on) one direction per Cartesian
component of the total angular momentum, since each ``L_a`` is a first-order
differential operator and ``(sum_i L_a,i)^2`` is a directional second derivative
along a per-walker constant seed plus first-order corrections
(:func:`deephall_tpu.hamiltonian` assembles them).

The reference obtains all of these from ``jax.hessian`` sweeps
(``/root/reference/deephall/hamiltonian.py:105-114``): one linearization plus 2N
forward-over-reverse tangent passes, each of which re-traverses the network's
backward graph.  This module instead propagates a **second-order jet** through a
single forward pass (the forward-Laplacian technique of arXiv:2307.08214, rebuilt
here for TPU): with ``K = 2N`` Laplacian directions and ``E`` extra directions
(``E = 1`` for Lz^2 alone, ``E = 3`` with the two extra L^2 directions — the
z one coincides with the Lz direction), every intermediate activation carries

* ``x``   — the primal value,
* ``j``   — ``K+E`` directional first derivatives (the 2N coordinate directions,
  with the phi columns pre-scaled by ``1/sin theta`` so the Laplacian comes out
  in the sphere metric, followed by the E extra directions),
* ``l``   — the summed second directional derivative over the K Laplacian
  directions,
* ``d``   — ``E`` individual second directional derivatives, one per extra
  direction (row 0 is the Lz^2 direction).

``E = d.shape[0]`` and ``K = j.shape[0] - E`` are static, so the split needs no
auxiliary metadata.  (A packed single-block variant — all channels in one stacked
tensor with static-index ``.at[].add`` curvature corrections — measured ~10%
SLOWER end-to-end on TPU: the dynamic-update-slices block XLA's elementwise
fusion, while the separate-field formulation fuses cleanly.)

Propagation rules compose from four primitives: linear maps (applied verbatim to
every channel), elementwise functions (first/second derivatives taken pointwise
with nested ``jax.jvp`` — no hand-derived tables), bilinear contractions (product
rule with a cross term over tangent channels), and closed-form input functions
(seeded directly with nested ``jax.jvp``).  Determinants get a custom rule in
terms of triangular solves against the primal LU (``ops.slogdet.solve``):

    d   log det A = tr(A^-1 dA)
    d^2 log det A = tr(A^-1 d^2 A) - tr((A^-1 dA)^2)

Everything is one big batched forward pass: dense layers see ``[(K+E)*B*T, D]``
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
    """Second-order jet of an intermediate value; see the module docstring."""

    x: jnp.ndarray  # [*S] primal
    j: jnp.ndarray  # [K+E, *S] directional first derivatives
    l: jnp.ndarray  # [*S] summed second derivative over the K Laplacian dirs
    d: jnp.ndarray  # [E, *S] second derivatives along the extra directions

    @property
    def extras(self) -> int:
        """Number of extra directions E (static)."""
        return self.d.shape[0]

    @property
    def j_lap(self) -> jnp.ndarray:
        """First derivatives along the K Laplacian directions, ``[K, *S]``."""
        return self.j[: -self.extras]

    @property
    def j_extra(self) -> jnp.ndarray:
        """First derivatives along the E extra directions, ``[E, *S]``."""
        return self.j[-self.extras :]


def add(a: Jet, b: Jet) -> Jet:
    """Jet of ``a + b`` (all channels add; broadcasting allowed)."""
    return Jet(a.x + b.x, a.j + b.j, a.l + b.l, a.d + b.d)


def shift(t: Jet, c: jnp.ndarray) -> Jet:
    """Jet of ``x + c`` for a constant ``c`` (derivative channels unchanged)."""
    return Jet(t.x + c, t.j, t.l, t.d)


def linear(f: Callable[[jnp.ndarray], jnp.ndarray], t: Jet, bias=None) -> Jet:
    """Jet of a linear map.

    ``f`` must act on trailing axes only (tensordot/reshape/moveaxis with negative
    axes), so it applies unchanged to the channel-stacked ``j`` and ``d``.
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
    jsq = jnp.sum(jnp.square(t.j_lap), axis=0)
    return Jet(
        x,
        f1 * t.j,
        f1 * t.l + f2 * jsq,
        f1 * t.d + f2 * jnp.square(t.j_extra),
    )


def bilinear(f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], a: Jet, b: Jet) -> Jet:
    """Jet of a bilinear contraction ``f(a, b)`` (product rule + tangent cross term).

    ``f`` must be written with leading-batch-friendly broadcasting (``...`` einsum
    patterns or plain elementwise arithmetic on trailing axes).
    """
    x = f(a.x, b.x)
    j = f(a.j, b.x[None]) + f(a.x[None], b.j)
    cross = f(a.j_lap, b.j_lap)
    l = f(a.l, b.x) + f(a.x, b.l) + 2 * jnp.sum(cross, axis=0)
    d = f(a.d, b.x[None]) + f(a.x[None], b.d) + 2 * f(a.j_extra, b.j_extra)
    return Jet(x, j, l, d)


def jet_of_fn(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    seeds: jnp.ndarray,
    extras: int = 1,
) -> Jet:
    """Seed a jet through a closed-form function with nested ``jax.jvp``.

    Used for the input-side functions (input features, monopole envelope, Jastrow)
    whose exact directional derivatives are cheap to take directly.

    Args:
        f: Function of the electron configuration.
        x: ``[*B, N, 2]`` configurations.
        seeds: ``[K+E, *B, N, 2]`` tangent directions (Laplacian first, extras last).
        extras: Number of extra directions E.
    """

    def d1(v):
        return jax.jvp(f, (x,), (v,))[1]

    def d2(v):
        return jax.jvp(lambda y: jax.jvp(f, (y,), (v,))[1], (x,), (v,))[1]

    j = jax.vmap(d1)(seeds)
    h = jax.vmap(d2)(seeds)
    return Jet(f(x), j, jnp.sum(h[:-extras], axis=0), h[-extras:])


def electron_seeds(data: jnp.ndarray, compute_l2: bool = False) -> jnp.ndarray:
    """Seed directions: sphere-metric Laplacian, Lz^2, and optionally L^2.

    Directions ``k = 2*i`` are ``e_theta_i``; ``k = 2*i + 1`` are
    ``e_phi_i / sin(theta_i)`` (per-walker scaling, so the summed second
    derivative lands directly in the sphere metric).  Extra direction 0 is
    ``sum_i e_phi_i`` (unscaled), whose second derivative gives Lz^2.  With
    ``compute_l2``, two more directions follow — the x and y Cartesian
    components of the total angular momentum,
    ``u_a[i] = (phihat_a(i), -thetahatprime_a(i))`` in (theta, phi) slots —
    whose second derivatives give the ``u_a^T H u_a`` quadratic forms of the
    L^2 contraction (see ``hamiltonian.forward_laplacian_local_energy``).  The
    z component needs no extra direction: ``phihat_z = 0`` and
    ``-thetahatprime_z = 1`` make ``u_z`` exactly the all-phi Lz direction
    already present as extra 0.

    Args:
        data: ``[*B, N, 2]`` electron configurations.
        compute_l2: Append the two non-degenerate L^2 directions.

    Returns:
        ``[2N+E, *B, N, 2]`` seed tangents (``E = 3`` with ``compute_l2`` else 1).
    """
    theta, phi = data[..., 0], data[..., 1]
    n = data.shape[-2]
    batch_ndim = data.ndim - 2
    eye = jnp.eye(2 * n).reshape((2 * n,) + (1,) * batch_ndim + (n, 2))
    scale = jnp.stack([jnp.ones_like(theta), 1.0 / jnp.sin(theta)], axis=-1)
    coord_seeds = eye * scale  # [2N, *B, N, 2]
    u = jnp.broadcast_to(
        jnp.stack([jnp.zeros_like(theta), jnp.ones_like(theta)], axis=-1), data.shape
    )
    seeds = [coord_seeds, u[None]]
    if compute_l2:
        phi_hat = jnp.stack([-jnp.sin(phi), jnp.cos(phi)])  # [2, *B, N]
        theta_hat_prime = jnp.stack(
            [jnp.cos(phi) / jnp.tan(theta), jnp.sin(phi) / jnp.tan(theta)]
        )
        seeds.append(jnp.stack([phi_hat, -theta_hat_prime], axis=-1))  # [2, *B, N, 2]
    return jnp.concatenate(seeds, axis=0)


class BMJet(NamedTuple):
    """Batch-minor jet: spatial axes lead, channels at ``-2``, walkers last.

    TPU maps the two minor axes of every materialised buffer to (8 sublanes,
    128 lanes).  The standard :class:`Jet` layout puts tiny spatial axes minor
    (e.g. the ``[..., T, S, H]`` attention logits with ``H = 4`` use 4 of 128
    lanes, and every pointwise op in the softmax chain pads 32x), while this
    layout keeps the thousands-wide walker batch in the lanes and the jet
    channels in the sublanes — both saturated at production shapes.

    ``x`` and ``l`` carry a singleton channel axis so that every field has the
    same rank and rules can index spatial axes positively:

    * ``x``: ``[*S, 1, B]``, ``j``: ``[*S, K+E, B]``,
      ``l``: ``[*S, 1, B]``, ``d``: ``[*S, E, B]``.
    """

    x: jnp.ndarray
    j: jnp.ndarray
    l: jnp.ndarray
    d: jnp.ndarray

    @property
    def extras(self) -> int:
        return self.d.shape[-2]

    @property
    def j_lap(self) -> jnp.ndarray:
        return self.j[..., : self.j.shape[-2] - self.extras, :]

    @property
    def j_extra(self) -> jnp.ndarray:
        return self.j[..., self.j.shape[-2] - self.extras :, :]


def to_bm(t: Jet, n_spatial: int) -> tuple[BMJet, tuple[int, ...]]:
    """Relayout a standard jet to batch-minor over its last ``n_spatial`` axes.

    Returns the :class:`BMJet` plus the original batch shape for :func:`from_bm`.
    """
    batch_shape = t.x.shape[: t.x.ndim - n_spatial]
    b = 1
    for s in batch_shape:
        b *= s

    def cvt(a):  # [*B, *S] -> [*S, 1, B]
        a = a.reshape(b, *a.shape[len(batch_shape) :])
        return jnp.moveaxis(a, 0, -1)[..., None, :]

    def cvt_ch(a):  # [C, *B, *S] -> [*S, C, B]
        a = a.reshape(a.shape[0], b, *a.shape[1 + len(batch_shape) :])
        return jnp.moveaxis(a, (0, 1), (-2, -1))

    return BMJet(cvt(t.x), cvt_ch(t.j), cvt(t.l), cvt_ch(t.d)), batch_shape


def from_bm(t: BMJet, batch_shape: tuple[int, ...]) -> Jet:
    """Inverse of :func:`to_bm`."""

    def cvt(a):  # [*S, 1, B] -> [*B, *S]
        a = jnp.moveaxis(a[..., 0, :], -1, 0)
        return a.reshape(*batch_shape, *a.shape[1:])

    def cvt_ch(a):  # [*S, C, B] -> [C, *B, *S]
        a = jnp.moveaxis(a, (-2, -1), (0, 1))
        return a.reshape(a.shape[0], *batch_shape, *a.shape[2:])

    return Jet(cvt(t.x), cvt_ch(t.j), cvt(t.l), cvt_ch(t.d))


def jet_moveaxis(t: Jet, src: int, dst: int) -> Jet:
    """Move one spatial axis across all four jet fields.

    ``src``/``dst`` must be negative (spatial axes counted from the end), so
    the same move applies to ``x``/``l`` (``[*S]``) and ``j``/``d``
    (``[C, *S]``) alike.
    """
    assert src < 0 and dst < 0, (src, dst)
    return Jet(
        jnp.moveaxis(t.x, src, dst),
        jnp.moveaxis(t.j, src, dst),
        jnp.moveaxis(t.l, src, dst),
        jnp.moveaxis(t.d, src, dst),
    )


def to_bm_tb(t: Jet) -> BMJet:
    """Relayout a token-major attention jet to batch-minor.

    Token-major spatial shape is ``[T, B, H, dh]`` (walker batch at ``-3``);
    the result is the same ``[T, H, dh, c, B]`` layout :func:`to_bm` produces
    from the standard ``[B, T, H, dh]`` — one transpose either way.
    """

    def cvt(a):  # [T, B, H, dh] -> [T, H, dh, 1, B]
        return jnp.moveaxis(a, -3, -1)[..., None, :]

    def cvt_ch(a):  # [C, T, B, H, dh] -> [T, H, dh, C, B]
        return jnp.moveaxis(a, (0, -3), (-2, -1))

    return BMJet(cvt(t.x), cvt_ch(t.j), cvt(t.l), cvt_ch(t.d))


def from_bm_tb(t: BMJet) -> Jet:
    """Inverse of :func:`to_bm_tb`: ``[T, H, dh, c, B]`` -> ``[T, B, H, dh]``."""

    def cvt(a):  # [T, H, dh, 1, B] -> [T, B, H, dh]
        return jnp.moveaxis(a[..., 0, :], -1, -3)

    def cvt_ch(a):  # [T, H, dh, C, B] -> [C, T, B, H, dh]
        return jnp.moveaxis(a, (-2, -1), (0, 2))

    return Jet(cvt(t.x), cvt_ch(t.j), cvt(t.l), cvt_ch(t.d))


def bm_shift(t: BMJet, c: jnp.ndarray) -> BMJet:
    """BM jet of ``x + c`` for a constant ``c``."""
    return BMJet(t.x + c, t.j, t.l, t.d)


def bm_linear(f: Callable[[jnp.ndarray], jnp.ndarray], t: BMJet) -> BMJet:
    """BM jet of a linear map; ``f`` must act on the leading spatial axes only.

    Because ``x``/``l`` carry a singleton channel axis, every field has the same
    rank and ``f`` may index axes positively (e.g. ``sum(axis=1)``).
    """
    return BMJet(f(t.x), f(t.j), f(t.l), f(t.d))


def bm_elementwise(f: Callable[[jnp.ndarray], jnp.ndarray], t: BMJet) -> BMJet:
    """BM jet of a pointwise function (same nested-``jvp`` rule as `elementwise`)."""
    ones = jnp.ones_like(t.x)
    x = f(t.x)
    _, f1 = jax.jvp(f, (t.x,), (ones,))
    _, f2 = jax.jvp(
        lambda y: jax.jvp(f, (y,), (jnp.ones_like(y),))[1], (t.x,), (ones,)
    )
    jsq = jnp.sum(jnp.square(t.j_lap), axis=-2, keepdims=True)
    return BMJet(
        x,
        f1 * t.j,
        f1 * t.l + f2 * jsq,
        f1 * t.d + f2 * jnp.square(t.j_extra),
    )


def bm_bilinear(
    f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], a: BMJet, b: BMJet
) -> BMJet:
    """BM jet of a bilinear contraction; ``f`` must preserve the trailing
    ``[channel, walker]`` axes (contract/broadcast spatial axes only)."""
    x = f(a.x, b.x)
    j = f(a.j, b.x) + f(a.x, b.j)
    cross = f(a.j_lap, b.j_lap)
    l = f(a.l, b.x) + f(a.x, b.l) + 2 * jnp.sum(cross, axis=-2, keepdims=True)
    d = f(a.d, b.x) + f(a.x, b.d) + 2 * f(a.j_extra, b.j_extra)
    return BMJet(x, j, l, d)


def logsumdet_jet(t: Jet) -> Jet:
    """Jet of ``log sum_d det(Phi_d)`` from the jet of the orbital matrices.

    ``t.x``: ``[*B, ndet, n, n]`` complex.  All derivative channels are solved
    against one LU factorisation per (walker, determinant): the channel RHS
    columns are concatenated into a single multi-RHS ``solve`` call.
    """
    phi = t.x
    n = phi.shape[-1]
    e = t.extras
    ke = t.j.shape[0]  # K + E

    # [ke, *B, ndet, n, n] -> [*B, ndet, n, ke*n] column blocks, then the l and
    # the E d-channel blocks.
    j_cols = jnp.moveaxis(t.j, 0, -2).reshape(*phi.shape[:-1], ke * n)
    d_cols = jnp.moveaxis(t.d, 0, -2).reshape(*phi.shape[:-1], e * n)
    rhs = jnp.concatenate([j_cols, t.l, d_cols], axis=-1)  # [*B, ndet, n, (ke+1+e)n]

    # One elimination per (walker, determinant) yields the determinant and every
    # channel's solve together.
    sign, logabs, m = slogdet_solve(phi, rhs)

    mj = m[..., : ke * n].reshape(*phi.shape[:-1], ke, n)
    mj = jnp.moveaxis(mj, -2, 0)  # [ke, *B, ndet, n, n]
    ml = m[..., ke * n : (ke + 1) * n]
    md = m[..., (ke + 1) * n :].reshape(*phi.shape[:-1], e, n)
    md = jnp.moveaxis(md, -2, 0)  # [e, *B, ndet, n, n]

    jz = jnp.trace(mj, axis1=-2, axis2=-1)  # [ke, *B, ndet]
    # tr((A^-1 dA)^2): summed over the Laplacian directions for l, per-direction
    # for the extras.
    sq_lap = jnp.einsum("k...ij,k...ji->k...", mj[:-e], mj[:-e])
    sq_extra = jnp.einsum("k...ij,k...ji->k...", mj[-e:], mj[-e:])
    lz = jnp.trace(ml, axis1=-2, axis2=-1) - jnp.sum(sq_lap, axis=0)
    dz = jnp.trace(md, axis1=-2, axis2=-1) - sq_extra

    z = Jet(logabs + jnp.log(sign), jz, lz, dz)

    # log-sum-exp over determinants; the shift is a constant and cancels exactly.
    c = jnp.max(z.x.real, axis=-1, keepdims=True)
    ex = elementwise(jnp.exp, shift(z, -c))
    s = linear(lambda v: jnp.sum(v, axis=-1), ex)
    out = elementwise(jnp.log, s)
    return shift(out, c[..., 0])

"""Local energy of electrons on the monopole sphere.

Physics parity with the reference Hamiltonian (``/root/reference/deephall/hamiltonian.py``):
kinetic energy with monopole magnetic terms, Coulomb or "harmonic" (Haldane
pseudopotential) interaction, and the Lz / Lz^2 / L^2 angular-momentum observables.

TPU-first redesign of the derivative pipeline.  The reference evaluates four separate
autodiff sweeps per walker (two ``jax.grad`` and two ``jax.hessian`` calls over the
real and imaginary parts, ``hamiltonian.py:105-114``) under an outer ``vmap``.  Here:

* the complex gradient is one ``jacrev`` over a stacked ``[Re, Im]`` output and the
  complex Hessian one forward-over-reverse sweep over that gradient — a single
  linearization shared by all 2N tangent columns;

* the **forward-Laplacian path** (:func:`forward_laplacian_local_energy`, used by
  the loss whenever the L^2 observable is switched off) propagates a second-order
  jet through one natively-batched forward pass instead of any Hessian sweeps
  (:mod:`deephall_tpu.ops.fwdlap`).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

import jax
from jax import numpy as jnp
from jax.numpy import cos, sin, tan

from deephall_tpu.config import InteractionType, System
from deephall_tpu.geometry import pairwise_cos
from deephall_tpu.types import (
    AngularMomenta,
    ArrayTree,
    LocalEnergy,
    LogPsiNetwork,
    OtherObservables,
)


def coulomb_potential(cos12: jnp.ndarray, Q: float, r: jnp.ndarray) -> jnp.ndarray:
    """Electron-electron Coulomb energy from pairwise cosines.

    Args:
        cos12: Cosine of the angle between electron pairs, ``[..., nelec, nelec]``.
        Q: Monopole strength (unused; kept for interface parity).
        r: Sphere radius.

    Returns:
        Total Coulomb energy summed over distinct pairs
        (reference ``hamiltonian.py:27-41``).
    """
    del Q
    nelec = cos12.shape[-1]
    mask = jnp.triu(jnp.ones((nelec, nelec)), k=1)
    # The +eye keeps the (masked-out) diagonal finite so no NaN leaks through 0 * inf.
    r_ee = jnp.sqrt(jnp.maximum(2 - 2 * cos12, 0)) + jnp.eye(nelec)
    return jnp.sum(mask / r_ee, axis=(-2, -1)) / r


def harmonic_potential(cos12: jnp.ndarray, Q: float) -> jnp.ndarray:
    """Haldane-pseudopotential ("harmonic") interaction on the LLL.

    V(theta_12) = 1 + (Q+1)/Q * cos(theta_12), summed over distinct pairs
    (reference ``hamiltonian.py:44-60``).

    Args:
        cos12: Cosine of the angle between electron pairs.
        Q: Monopole strength.

    Returns:
        Total pair energy.
    """
    nelec = cos12.shape[-1]
    mask = jnp.triu(jnp.ones((nelec, nelec)), k=1)
    return jnp.sum(mask * (1 + (Q + 1) / Q * cos12), axis=(-2, -1))


def make_potential(
    interaction_type: InteractionType, Q: float, r: jnp.ndarray
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Create the potential-energy function for the given interaction and geometry.

    The returned function accepts any number of leading batch axes.
    """
    if interaction_type == InteractionType.coulomb:
        pair_fn = partial(coulomb_potential, Q=Q, r=r)
    elif interaction_type == InteractionType.harmonic:
        pair_fn = partial(harmonic_potential, Q=Q)
    else:  # pragma: no cover - config enum is closed
        raise ValueError(f"Unknown interaction type {interaction_type}")

    def potential(data: jnp.ndarray) -> jnp.ndarray:
        return pair_fn(pairwise_cos(data))

    return potential


def _assemble_observables(
    theta: jnp.ndarray,
    phi: jnp.ndarray,
    grad: jnp.ndarray,
    hess: jnp.ndarray,
    Q: float,
    r: jnp.ndarray,
) -> tuple[jnp.ndarray, AngularMomenta]:
    """Kinetic energy and angular momenta from the complex gradient and Hessian.

    Args:
        theta, phi: ``[nelec]`` coordinates of one walker.
        grad: complex ``[nelec, 2]`` gradient of log psi.
        hess: complex ``[nelec, 2, nelec, 2]`` Hessian of log psi.
        Q: Monopole strength.
        r: Sphere radius.

    Returns:
        ``(kinetic_energy, AngularMomenta)`` — same operator algebra as the reference
        (``hamiltonian.py:96-170``).
    """
    g_theta, g_phi = grad[..., 0], grad[..., 1]
    sin_t = sin(theta)
    tan_t = tan(theta)
    h_tt = hess[:, 0, :, 0]
    h_tp = hess[:, 0, :, 1]
    h_pp = hess[:, 1, :, 1]

    # --- Kinetic energy -----------------------------------------------------------
    square_grad_logpsi = jnp.sum(g_theta**2 + g_phi**2 / sin_t**2)
    grad_grad_logpsi = jnp.sum(
        g_theta / tan_t + jnp.diagonal(h_tt) + jnp.diagonal(h_pp) / sin_t**2
    )
    magnetic_contribution = jnp.sum(
        (Q / tan_t) ** 2 + 2j * Q * cos(theta) / sin_t**2 * g_phi
    )
    kinetic_energy = (
        -grad_grad_logpsi - square_grad_logpsi + magnetic_contribution
    ) / 2 / r**2

    # --- Angular momentum square L^2 ----------------------------------------------
    col = (Ellipsis, slice(None), jnp.newaxis)  # [..., :, None]
    row = (Ellipsis, jnp.newaxis, slice(None))  # [..., None, :]
    r_hat = jnp.stack([sin_t * cos(phi), sin_t * sin(phi), cos(theta)])
    phi_hat = jnp.stack([-sin(phi), cos(phi), jnp.zeros_like(phi)])
    theta_hat_prime = jnp.stack(
        [cos(phi) / tan_t, sin(phi) / tan_t, -jnp.ones_like(theta)]
    )
    psi_tt = h_tt + g_theta[col] * g_theta[row]
    psi_tp = h_tp + g_theta[col] * g_phi[row]
    psi_pp = h_pp + g_phi[col] * g_phi[row]
    magnetic_term = Q * (theta_hat_prime * cos(theta) + r_hat)
    angular_momentum_square = jnp.sum(
        2 * phi_hat[col] * theta_hat_prime[row] * psi_tp
        - phi_hat[col] * phi_hat[row] * psi_tt
        - theta_hat_prime[col] * theta_hat_prime[row] * psi_pp
        - (2j * magnetic_term[row])
        * (phi_hat[col] * g_theta[col] - theta_hat_prime[col] * g_phi[col])
        + magnetic_term[col] * magnetic_term[row]
    ) - jnp.sum(g_theta / tan_t)  # diagonal correction for non-commuting terms

    other_observables = AngularMomenta(
        angular_momentum_z=jnp.sum(g_phi).imag,
        angular_momentum_z_square=-jnp.sum(psi_pp).real,
        angular_momentum_square=angular_momentum_square.real,
    )
    return kinetic_energy, other_observables


def make_local_kinetic_energy(f: LogPsiNetwork, Q: float, r: jnp.ndarray):
    r"""Create the per-walker local kinetic-energy function.

    Args:
        f: Complex log-wavefunction ``f(params, data)`` for one configuration.
        Q: Monopole strength (flux / 2).
        r: Sphere radius.

    Returns:
        Function ``(params, data[nelec, 2]) -> (kinetic_energy, AngularMomenta)``.
    """

    def _lapl_over_f(
        params: ArrayTree, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, AngularMomenta]:
        def stacked_grad(x):
            def re_im(y):
                out = f(params, y)
                return jnp.stack([out.real, out.imag])

            g = jax.jacrev(re_im)(x)
            return g, g

        hess_ri, grad_ri = jax.jacfwd(stacked_grad, has_aux=True)(data)
        grad = grad_ri[0] + 1j * grad_ri[1]  # [N, 2]
        hess = hess_ri[0] + 1j * hess_ri[1]  # [N, 2, N, 2]
        return _assemble_observables(data[..., 0], data[..., 1], grad, hess, Q, r)

    return _lapl_over_f


def forward_laplacian_local_energy(model, system: System) -> LocalEnergy:
    """Batched local energy via one forward-Laplacian pass (no Hessian sweeps).

    The second-order jet carries exactly the derivative reductions the energy
    needs — the sphere-metric Laplacian, per-electron gradients, and the all-phi
    direction for ``Lz``/``Lz^2`` — in a single forward pass of the network
    (:mod:`deephall_tpu.networks.fwdlap`), instead of the 2N forward-over-reverse
    tangent passes of the full-Hessian path (reference
    ``hamiltonian.py:105-114``).

    When the ``L^2`` observable is requested (``system.compute_l2`` or an
    ``l2_penalty``), two more jet directions are carried — the x and y Cartesian
    components of the total angular momentum (the z component's direction is
    the Lz one already present).  Each ``L_a`` is a first-order
    differential operator, so the full-Hessian contraction of the reference
    (``hamiltonian.py:139-159``) collapses to directional second derivatives
    along per-walker constant seeds ``u_a`` plus first-order terms:

        L^2 = sum_a [ -u_a^T H u_a - G_a^2 - 2i Mbar_a G_a + Mbar_a^2 ]
              - sum_i g_theta_i / tan theta_i

    with ``G_a = u_a . grad log psi`` (a jet first-derivative channel),
    ``u_a^T H u_a`` a jet second-derivative channel, and
    ``Mbar_a = sum_i Q (thetahat'_a cos theta + rhat_a)_i`` analytic.  No full
    Hessian is ever formed; equivalence with the Hessian path is pinned by
    ``tests/test_fwdlap.py``.

    Args:
        model: The Psiformer module (its hyperparameters drive the jet evaluator).
        system: System configuration.

    Returns:
        Function ``(params, data[B, nelec, 2]) -> (E_L [B], OtherObservables [B])``.
    """
    from deephall_tpu.networks.fwdlap import psiformer_logpsi_jet

    Q = system.flux / 2
    radius = jnp.asarray(system.radius if system.radius is not None else jnp.sqrt(Q))
    pe = make_potential(system.interaction_type, Q, radius)
    compute_l2 = bool(system.compute_l2 or system.l2_penalty)

    def _e_l(
        params: ArrayTree, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, OtherObservables]:
        out = psiformer_logpsi_jet(model, params, data, compute_l2=compute_l2)
        theta, phi = data[..., 0], data[..., 1]
        sin_t = sin(theta)
        tan_t = tan(theta)
        n = data.shape[-2]

        # Seed ordering (fwdlap.electron_seeds): Laplacian row 2i is e_theta_i,
        # row 2i+1 is e_phi_i / sin(theta_i); extra rows are [sum_i e_phi_i]
        # (+ the three L^2 directions when requested).
        jc = out.j_lap.reshape(n, 2, *out.x.shape)
        g_theta = jnp.moveaxis(jc[:, 0], 0, -1)  # [*B, N]
        g_phi = jnp.moveaxis(jc[:, 1], 0, -1) * sin_t

        square_grad_logpsi = jnp.sum(out.j_lap**2, axis=0)
        grad_grad_logpsi = jnp.sum(g_theta / tan_t, axis=-1) + out.l
        magnetic_contribution = jnp.sum(
            (Q / tan_t) ** 2 + 2j * Q * cos(theta) / sin_t**2 * g_phi, axis=-1
        )
        kinetic = (
            -grad_grad_logpsi - square_grad_logpsi + magnetic_contribution
        ) / 2 / radius**2

        g_phi_sum = out.j_extra[0]  # first derivative along the all-phi direction
        if compute_l2:
            # Mbar_a = sum_i M_a(i), M = Q (thetahat' cos theta + rhat): [3, *B].
            r_hat = jnp.stack([sin_t * cos(phi), sin_t * sin(phi), cos(theta)])
            theta_hat_prime = jnp.stack(
                [cos(phi) / tan_t, sin(phi) / tan_t, -jnp.ones_like(theta)]
            )
            mbar = jnp.sum(Q * (theta_hat_prime * cos(theta) + r_hat), axis=-1)
            # u_z is the all-phi Lz direction (extra row 0): phihat_z = 0 and
            # -thetahatprime_z = 1, so its channels are reused rather than
            # carried twice (fwdlap.electron_seeds).  Order (x, y, z) = mbar's.
            g_a = jnp.stack([out.j_extra[1], out.j_extra[2], out.j_extra[0]])
            d2_a = jnp.stack([out.d[1], out.d[2], out.d[0]])
            l_square = (
                jnp.sum(-d2_a - g_a**2 - 2j * mbar * g_a + mbar**2, axis=0)
                - jnp.sum(g_theta / tan_t, axis=-1)
            ).real
        else:
            l_square = jnp.full(out.x.shape, jnp.nan)
        angular_momenta = AngularMomenta(
            angular_momentum_z=g_phi_sum.imag,
            angular_momentum_z_square=-(out.d[0] + g_phi_sum**2).real,
            angular_momentum_square=l_square,
        )
        potential = pe(data) * system.interaction_strength
        return kinetic + potential, angular_momenta | {
            "potential": potential,
            "kinetic": kinetic,
        }

    return _e_l


def local_energy(f: LogPsiNetwork, system: System) -> LocalEnergy:
    """Create the per-walker local-energy function (reference ``hamiltonian.py:175-212``).

    Args:
        f: Complex log-wavefunction ``f(params, data)``.
        system: System configuration (flux, radius, interaction).

    Returns:
        Function ``(params, data) -> (E_L, OtherObservables)``.
    """
    Q = system.flux / 2
    radius = jnp.asarray(system.radius if system.radius is not None else jnp.sqrt(Q))
    ke = make_local_kinetic_energy(f, Q, radius)
    pe = make_potential(system.interaction_type, Q, radius)

    def _e_l(
        params: ArrayTree, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, OtherObservables]:
        potential = pe(data) * system.interaction_strength
        kinetic, angular_momenta = ke(params, data)
        return kinetic + potential, angular_momenta | {
            "potential": potential,
            "kinetic": kinetic,
        }

    return _e_l

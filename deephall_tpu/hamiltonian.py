"""Local energy of electrons on the monopole sphere.

Physics parity with the reference Hamiltonian (``/root/reference/deephall/hamiltonian.py``):
kinetic energy with monopole magnetic terms, Coulomb or "harmonic" (Haldane
pseudopotential) interaction, and the Lz / Lz^2 / L^2 angular-momentum observables.

TPU-first redesign of the derivative pipeline: the reference evaluates four separate
autodiff sweeps per walker (two ``jax.grad`` and two ``jax.hessian`` calls over the real
and imaginary parts, ``hamiltonian.py:105-114``).  Here the complex gradient is a single
``jacrev`` over a stacked ``[Re, Im]`` output and the complex Hessian a single
forward-over-reverse ``jacfwd`` over that gradient — one linearization shared by all 2N
tangent columns, with the gradient recovered from the same pass via ``has_aux``.  Under
``vmap`` the tangent axis batches with the walker axis, so every pass is a large matmul
on the MXU.
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
    r_ee = jnp.sqrt(2 - 2 * cos12)
    return jnp.sum(jnp.triu(1 / r_ee, k=1)) / r


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
    return jnp.sum(jnp.triu(1 + (Q + 1) / Q * cos12, k=1))


def make_potential(
    interaction_type: InteractionType, Q: float, r: jnp.ndarray
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Create the potential-energy function for the given interaction and geometry."""
    if interaction_type == InteractionType.coulomb:
        pair_fn = partial(coulomb_potential, Q=Q, r=r)
    elif interaction_type == InteractionType.harmonic:
        pair_fn = partial(harmonic_potential, Q=Q)
    else:  # pragma: no cover - config enum is closed
        raise ValueError(f"Unknown interaction type {interaction_type}")

    def potential(data: jnp.ndarray) -> jnp.ndarray:
        return pair_fn(pairwise_cos(data))

    return potential


def make_local_kinetic_energy(f: LogPsiNetwork, Q: float, r: jnp.ndarray):
    r"""Create the local kinetic-energy function ``-\nabla^2 \psi / 2\psi`` on the sphere.

    Includes the monopole magnetic contribution (Jain, "Composite Fermions" §3.10.3) and
    the angular-momentum observables Lz, Lz^2 and L^2, matching the reference operator
    (``hamiltonian.py:83-172``) to numerical precision.

    Args:
        f: Complex log-wavefunction ``f(params, data)`` for one configuration.
        Q: Monopole strength (flux / 2).
        r: Sphere radius.

    Returns:
        Function ``(params, data) -> (kinetic_energy, AngularMomenta)``.
    """

    def _lapl_over_f(
        params: ArrayTree, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, AngularMomenta]:
        theta, phi = data[..., 0], data[..., 1]

        def stacked_grad(x):
            """Gradient of [Re logpsi, Im logpsi] w.r.t. coordinates: [2, N, 2]."""

            def re_im(y):
                out = f(params, y)
                return jnp.stack([out.real, out.imag])

            g = jax.jacrev(re_im)(x)
            return g, g

        # One forward-over-reverse sweep: complex Hessian + gradient together.
        hess_ri, grad_ri = jax.jacfwd(stacked_grad, has_aux=True)(data)
        grad = grad_ri[0] + 1j * grad_ri[1]  # [N, 2]
        hess = hess_ri[0] + 1j * hess_ri[1]  # [N, 2, N, 2]

        g_theta, g_phi = grad[..., 0], grad[..., 1]
        sin_t = sin(theta)
        tan_t = tan(theta)
        h_tt = hess[:, 0, :, 0]
        h_tp = hess[:, 0, :, 1]
        h_pp = hess[:, 1, :, 1]

        # --- Kinetic energy -------------------------------------------------------
        # (\nabla log psi)^2 on the sphere (complex square, no conjugation).
        square_grad_logpsi = jnp.sum(g_theta**2 + g_phi**2 / sin_t**2)
        # \nabla^2 log psi on the sphere.
        grad_grad_logpsi = jnp.sum(
            g_theta / tan_t + jnp.diagonal(h_tt) + jnp.diagonal(h_pp) / sin_t**2
        )
        magnetic_contribution = jnp.sum(
            (Q / tan_t) ** 2 + 2j * Q * cos(theta) / sin_t**2 * g_phi
        )
        sum_kinetic_momentum_square = (
            -grad_grad_logpsi - square_grad_logpsi + magnetic_contribution
        )
        kinetic_energy = sum_kinetic_momentum_square / 2 / r**2

        # --- Angular momentum square L^2 -----------------------------------------
        # Same operator algebra as the reference (hamiltonian.py:139-159): assemble
        # second derivatives of psi (not log psi) via H + g g^T outer products,
        # contract with the spherical frame vectors, then correct the diagonal.
        col = (Ellipsis, slice(None), jnp.newaxis)  # [..., :, None]
        row = (Ellipsis, jnp.newaxis, slice(None))  # [..., None, :]
        r_hat = jnp.stack([sin_t * cos(phi), sin_t * sin(phi), cos(theta)])
        phi_hat = jnp.stack([-sin(phi), cos(phi), jnp.zeros_like(phi)])
        # theta_hat / sin(theta), folded together for stability.
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
            angular_momentum_z=jnp.sum(g_phi).imag,  # (-i d_phi) expectation
            angular_momentum_z_square=-jnp.sum(psi_pp).real,
            angular_momentum_square=angular_momentum_square.real,
        )
        return kinetic_energy, other_observables

    return _lapl_over_f


def local_energy(f: LogPsiNetwork, system: System) -> LocalEnergy:
    """Create the local-energy function for one walker.

    Args:
        f: Complex log-wavefunction ``f(params, data)``.
        system: System configuration (flux, radius, interaction).

    Returns:
        Function ``(params, data) -> (E_L, OtherObservables)``
        (reference ``hamiltonian.py:175-212``).
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

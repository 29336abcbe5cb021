"""Physics-oracle tests for the kinetic-energy operator.

Exact quantum-mechanical identities (not regression snapshots), following the
reference's test strategy (``/root/reference/tests/hamiltonian_test.py``):
free electrons in Y_1m orbitals must give KE=3 and L^2=0; exact lowest-Landau-level
determinants must give KE = nelec/2 and known L^2.
"""

import jax
import pytest
from jax import numpy as jnp

from deephall_tpu import hamiltonian


def sample(key, batch, nelec):
    key1, key2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(key1, (batch, nelec), minval=-1, maxval=1))
    phi = jax.random.uniform(key2, (batch, nelec), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


def make_lll(nelec: int, Q: int):
    """Exact LLL determinant wavefunction at monopole strength Q."""

    def log_psi(params, data):
        theta, phi = data[..., 0], data[..., 1]
        u = jnp.cos(theta / 2) * jnp.exp(1j * phi / 2)
        v = jnp.sin(theta / 2) * jnp.exp(-1j * phi / 2)
        lll_orb = jnp.stack([u**m * v ** (2 * Q - m) for m in range(nelec)], axis=-1)
        sign, logdet = jnp.linalg.slogdet(lll_orb)
        return logdet + jnp.log(sign)

    return log_psi


def test_free_electron():
    def log_psi(params, data):
        """Determinant of l=1 spherical harmonics Y_1m."""
        theta, phi = data[..., 0], data[..., 1]
        orb = jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.cos(theta),
                jnp.sin(theta) * jnp.sin(phi),
            ],
            axis=-1,
        )
        sign, logdet = jnp.linalg.slogdet(orb)
        return logdet + jnp.log(sign)

    data = sample(jax.random.PRNGKey(1898), 2, nelec=3)
    laplacian = hamiltonian.make_local_kinetic_energy(log_psi, Q=0, r=1)
    batch_laplacian = jax.jit(jax.vmap(laplacian, in_axes=(None, 0)))
    ke, other_observables = batch_laplacian(None, data)
    assert jnp.allclose(ke, 3, atol=1e-3)
    assert jnp.allclose(other_observables["angular_momentum_square"], 0, atol=1e-3)


@pytest.mark.parametrize("nelec,Q,L_square", [(1, 1, 2), (3, 1, 0), (9, 4, 0)])
def test_kinetic_and_angular_momentum(nelec: int, Q: int, L_square: float):
    data = sample(jax.random.PRNGKey(1898), 2, nelec)
    laplacian = hamiltonian.make_local_kinetic_energy(
        make_lll(nelec, Q), Q, jnp.sqrt(Q)
    )
    batch_laplacian = jax.jit(jax.vmap(laplacian, in_axes=(None, 0)))
    ke, other_observables = batch_laplacian(None, data)
    assert jnp.allclose(ke, nelec / 2, atol=1e-3)
    assert jnp.allclose(
        other_observables["angular_momentum_square"], L_square, atol=1e-3
    )


def test_potentials():
    """Coulomb of two antipodal electrons = 1/(2r); harmonic closed form."""
    data = jnp.array([[jnp.pi / 2, 0.0], [jnp.pi / 2, jnp.pi]])  # antipodal on equator
    pe = hamiltonian.make_potential(
        hamiltonian.InteractionType.coulomb, Q=1, r=jnp.asarray(2.0)
    )
    assert jnp.allclose(pe(data), 1 / (2 * 2.0))
    pe_h = hamiltonian.make_potential(
        hamiltonian.InteractionType.harmonic, Q=1.0, r=jnp.asarray(1.0)
    )
    # cos(theta_12) = -1 -> 1 + 2*(-1) = -1
    assert jnp.allclose(pe_h(data), -1.0)

"""Monopole-harmonics tests against independent ground truths.

Three anchors pin the implementation and its phase convention:

1. q = 0 reduces to the standard spherical harmonics (scipy).
2. generic (q, l, m), including half-integers, match the Wigner small-d matrix
   computed by direct eigendecomposition of the J_y irrep generator:
   Y_{q,l,m} = sqrt((2l+1)/4pi) <l q| exp(-i theta J_y) |l m> e^{i m phi}.
3. exact orthonormality on a Gauss-Legendre x uniform-phi product quadrature
   (the integrands are polynomials in cos(theta), so the quadrature is exact).

Plus the LLL identity: Y_{q,q,m} is proportional to the spinor monomial
u^{q+m} v^{q-m} used by the network orbital envelope.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from deephall_tpu.geometry import spinors
from deephall_tpu.observables.harmonics import make_monopole_harm


def _wigner_d_expm(l, theta):  # noqa: E741
    """d^l(theta) = exp(-i theta J_y) by eigendecomposition; basis m = -l..l."""
    dim = int(round(2 * l)) + 1
    ms = np.array([-l + i for i in range(dim)])
    j_plus = np.zeros((dim, dim))
    for i in range(dim - 1):
        j_plus[i + 1, i] = np.sqrt(l * (l + 1) - ms[i] * (ms[i] + 1))
    j_y = (j_plus - j_plus.T) / 2j
    w, v = np.linalg.eigh(j_y)
    return (v @ np.diag(np.exp(-1j * theta * w)) @ v.conj().T).real, ms


@pytest.mark.parametrize("twol", [1, 2, 3, 5, 8])
def test_matches_jy_exponential(twol):
    l = twol / 2  # noqa: E741
    for theta in (0.0, 0.4, 1.3, 2.6, np.pi):
        d_mat, ms = _wigner_d_expm(l, theta)
        for i, q in enumerate(ms):
            for j, m in enumerate(ms):
                got = complex(
                    make_monopole_harm(q, l, m)(jnp.asarray([theta, 0.0]))
                )
                want = math.sqrt((2 * l + 1) / (4 * math.pi)) * d_mat[i, j]
                assert got.imag == pytest.approx(0.0, abs=1e-5)
                assert got.real == pytest.approx(want, abs=2e-5)


def test_q0_reduces_to_spherical_harmonics():
    """At q=0: standard Y_l^m up to the Condon-Shortley phase.

    The Wu-Yang gauge (which the reference's 1-RDM basis also uses) defines the
    harmonics without the (-1)^m Condon-Shortley factor that scipy includes.
    """
    sph_harm = pytest.importorskip("scipy.special").sph_harm_y
    rng = np.random.default_rng(3)
    theta = rng.uniform(0.05, np.pi - 0.05, 7)
    phi = rng.uniform(-np.pi, np.pi, 7)
    pts = jnp.stack([jnp.asarray(theta), jnp.asarray(phi)], axis=-1)
    for l in range(5):  # noqa: E741
        for m in range(-l, l + 1):
            got = np.asarray(make_monopole_harm(0.0, float(l), float(m))(pts))
            want = (-1.0) ** m * sph_harm(l, m, theta, phi)
            np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("q", [0.0, 0.5, 1.0, 2.5])
def test_orthonormal_on_exact_quadrature(q):
    """<Y_{q,l,m} | Y_{q,l',m'}> = delta_{ll'} delta_{mm'} by exact quadrature."""
    l_max = q + 2
    basis = [
        (l, m)
        for l in np.arange(q, l_max + 1)  # noqa: E741
        for m in np.arange(-l, l + 1)
    ]
    # |Y|^2 integrands are polynomials in x = cos(theta) of degree <= 2*l_max and
    # Fourier modes e^{i(m-m')phi}: Gauss-Legendre x uniform phi integrates exactly.
    n_leg = int(2 * l_max) + 2
    x_nodes, x_weights = np.polynomial.legendre.leggauss(n_leg)
    n_phi = int(4 * l_max) + 3
    phi_nodes = 2 * np.pi * np.arange(n_phi) / n_phi
    theta_grid, phi_grid = np.meshgrid(np.arccos(x_nodes), phi_nodes, indexing="ij")
    pts = jnp.stack(
        [jnp.asarray(theta_grid.ravel()), jnp.asarray(phi_grid.ravel())], axis=-1
    )
    weights = np.repeat(x_weights, n_phi) * (2 * np.pi / n_phi)

    ys = np.stack(
        [np.asarray(make_monopole_harm(q, l, m)(pts)) for l, m in basis], axis=-1
    )
    gram = np.einsum("n,ni,nj->ij", weights, np.conj(ys), ys)
    np.testing.assert_allclose(gram, np.eye(len(basis)), atol=2e-4)


def test_lll_matches_network_envelope():
    """Y_{q,q,m} = (-1)^(q-m) sqrt((2q+1)/4pi * C(2q, q-m)) u^(q+m) v^(q-m)."""
    q = 1.5
    rng = np.random.default_rng(5)
    theta = jnp.asarray(rng.uniform(0.1, np.pi - 0.1, 9))
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, 9))
    pts = jnp.stack([theta, phi], axis=-1)
    u, v = spinors(theta, phi)
    for m in np.arange(-q, q + 1):
        got = np.asarray(make_monopole_harm(q, q, m)(pts))
        coeff = math.sqrt(
            (2 * q + 1) / (4 * math.pi) * math.comb(int(2 * q), int(q - m))
        )
        want = (-1.0) ** int(q - m) * coeff * np.asarray(u ** (q + m) * v ** (q - m))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_rejects_invalid_quantum_numbers():
    with pytest.raises(ValueError):
        make_monopole_harm(2.0, 1.0, 0.0)
    with pytest.raises(ValueError):
        make_monopole_harm(0.0, 1.0, 2.0)

"""Exact-diagonalization oracles (observables/ed.py).

Every assertion here is an exact identity or a closed form, not a snapshot:
the harmonic interaction's LLL spectrum is an affine function of L(L+1)
(position operator ~ angular momentum within the LLL irrep), the hard-core
``V_1`` interaction has the Laughlin state as its unique zero mode at
``2Q = 3(N-1)``, and the 2Q=1 Coulomb pseudopotential integrates in closed
form to ``2 sqrt(2)/3``.  The N=3, 2Q=6 Coulomb block cross-anchors the CLI's
literature oracle (energy = 2.58, ``tests/test_cli.py``): that block has a
*unique* L = 0 state, so the exact ground state IS the Laughlin state and the
two pipelines must agree exactly.
"""

import numpy as np
import pytest

from deephall_tpu.observables import ed


def test_orbitals_orthonormal():
    """The k=0 spherical-harmonic element is the Gram matrix (times Y_00)."""
    for two_q in (2, 3, 15):
        m00 = ed.y_matrix_elements(two_q)[(0, 0)] * np.sqrt(4.0 * np.pi)
        np.testing.assert_allclose(m00, np.eye(two_q + 1), atol=1e-12)


def test_pair_elements_symmetries():
    v4 = ed.pair_elements(4, "coulomb")
    # hermitian (real): <a'b'|V|ab> = <ab|V|a'b'>
    np.testing.assert_allclose(v4, v4.transpose(2, 3, 0, 1), atol=1e-12)
    # particle exchange: <a'b'|V|ab> = <b'a'|V|ba>
    np.testing.assert_allclose(v4, v4.transpose(1, 0, 3, 2), atol=1e-12)


def test_coulomb_pseudopotential_closed_form_2q1():
    """2Q=1: the single antisymmetric pair state integrates to 2 sqrt(2)/3.

    (Independently verified against brute-force 3-D quadrature of the pair
    density; the value is exact.)
    """
    (v0,) = ed.pseudopotentials(1, "coulomb")
    assert abs(v0 - 2.0 * np.sqrt(2.0) / 3.0) < 1e-10


def test_coulomb_pseudopotentials_monotone():
    """Closer pairs (higher J = lower relative m) cost more Coulomb energy."""
    vj = ed.pseudopotentials(9, "coulomb")  # ordered J = 2Q-1, 2Q-3, ...
    assert np.all(np.diff(vj) < 0.0)
    assert np.all(vj > 0.0)


def test_harmonic_pseudopotentials_closed_form():
    """V_J^harm = 1 + (Q+1)/Q * [J(J+1)/2 - Q(Q+1)] / (Q+1)^2 exactly."""
    two_q = 5
    q = two_q / 2.0
    vj = ed.pseudopotentials(two_q, "harmonic")
    js = np.arange(two_q - 1, -1, -2, dtype=float)
    expected = 1.0 + (q + 1.0) / q * (js * (js + 1) / 2.0 - q * (q + 1)) / (
        (q + 1.0) ** 2
    )
    np.testing.assert_allclose(vj, expected, atol=1e-10)


def test_harmonic_many_body_operator_identity():
    """H_harm == N(N-1)/2 + [L^2 - N Q(Q+1)] / (2Q(Q+1)) as matrices.

    The strongest single check of the many-body machinery: basis enumeration,
    fermionic signs, antisymmetrized elements and the L^2 applier must all be
    simultaneously correct for two independently-built matrices to coincide.
    """
    nelec, two_q = 3, 4
    q = two_q / 2.0
    basis = ed.lz_basis(two_q + 1, nelec, 0)
    h = ed._build_hamiltonian(ed.pair_elements(two_q, "harmonic"), basis)
    dim = len(basis)
    l2m = np.zeros((dim, dim))
    for c in range(dim):
        e = np.zeros(dim)
        e[c] = 1.0
        l2m[:, c] = ed._apply_total_l2(two_q, basis, e)
    pred = nelec * (nelec - 1) / 2.0 * np.eye(dim) + (
        l2m - nelec * q * (q + 1.0) * np.eye(dim)
    ) / (2.0 * q * (q + 1.0))
    np.testing.assert_allclose(h, pred, atol=1e-12)


@pytest.mark.parametrize("nelec", [3, 4])
def test_hardcore_laughlin_zero_mode(nelec):
    """V_1-only interaction: unique zero mode with L^2 = 0 at 2Q = 3(N-1)."""
    two_q = 3 * (nelec - 1)
    v4 = ed.hardcore_v1_elements(two_q)
    res = ed.ed_block(nelec, two_q, two_lz=0, v4=v4)
    assert abs(res.energies[0]) < 1e-10  # the Laughlin zero mode
    assert res.energies[1] > 0.05  # gapped
    assert abs(res.ground_l2) < 1e-8  # rotationally invariant
    # no zero modes hide in other Lz sectors (no L > 0 zero-energy multiplet)
    res_lz = ed.ed_block(nelec, two_q, two_lz=2, v4=v4)
    assert res_lz.energies[0] > 0.05


def test_coulomb_n3_matches_cli_laughlin_anchor():
    """N=3, 2Q=6: unique L=0 state => exact GS == Laughlin == CLI oracle 2.58.

    ``tests/test_cli.py`` pins the analytic-Laughlin inference run to
    energy 2.58 (reference ``tests/cli_test.py`` oracle); the exact
    diagonalization reproduces it from first principles with no Monte Carlo
    and no neural network: total = N/2 + E0 = 2.5867...
    """
    res = ed.ed_block(3, 6, two_lz=0)
    assert abs(res.ground_l2) < 1e-8
    assert abs(res.total_energy(3) - 2.5867) < 5e-4
    # uniqueness of the L = 0 state in this block: the hard-core spectrum has
    # exactly one zero mode, and it spans the same 1-D L=0 subspace
    v4_hc = ed.hardcore_v1_elements(6)
    hc = ed.ed_block(3, 6, two_lz=0, v4=v4_hc)
    zero_modes = np.sum(np.abs(hc.energies) < 1e-10)
    assert zero_modes == 1
    overlap = abs(float(hc.ground_state @ res.ground_state))
    assert abs(overlap - 1.0) < 1e-10


def test_production_block_n6_q15():
    """Exact LLL ground state of the production nu=1/3 system (N=6, 2Q=15).

    Regression-pins the number BASELINE.md compares the VMC runs against:
    E_total(LLL) = 6.8716349.  Physics ordering (checked in BASELINE.md, not
    here, since the VMC numbers carry MC error): VMC 6.86847(13) sits *below*
    (Landau-level mixing), the Laughlin expectation 6.87306(6) *above*
    (variational within the LLL).
    """
    res = ed.ed_block(6, 15, two_lz=0)
    assert res.dim == 338
    assert abs(res.ground_l2) < 1e-6
    assert abs(res.total_energy(6) - 6.87163491) < 1e-6
    # incompressible: the L=0 ground state lives in Lz=0 only
    res_lz = ed.ed_block(6, 15, two_lz=2)
    assert res_lz.energies[0] > res.energies[0] + 1e-4


def test_pair_correlation_curve_nu1_closed_form():
    """nu=1: the exact pair curve is the filled-LLL kernel 1 - cos^{4Q}(t/2).

    Pins the estimator-convention normalization (the same bins
    ``observables.estimators.pair_histogram`` produces) to machine precision.
    """
    res = ed.ed_block(3, 2, two_lz=0)
    assert res.dim == 1  # nu=1 is a single Slater determinant
    curve = ed.pair_correlation_curve(res, 2, bins=64)
    t = (np.arange(64) + 0.5) * np.pi / 64
    np.testing.assert_allclose(curve, 1.0 - np.cos(t / 2.0) ** 4, atol=1e-12)


def test_structure_factor_exact_identities():
    """S_0 = N; S_1 = 1/(Q+1) for L=0 LLL states; nu=1 closed forms."""
    r = ed.ed_block(3, 2, two_lz=0)  # nu=1: single determinant
    s = ed.structure_factor(r, 2, lmax=4)
    # Independent quadrature of the filled-LLL kernel 1 - cos^{4Q}(t/2).
    nodes, w = np.polynomial.legendre.leggauss(64)
    dens = 1.0 - ((1.0 + nodes) / 2.0) ** 2
    z = np.sum(w * dens)
    expected = [
        1.0 + 2.0 * np.sum(w * dens * np.polynomial.legendre.Legendre.basis(L)(nodes)) / z
        for L in range(5)
    ]
    np.testing.assert_allclose(s, expected, atol=1e-12)
    np.testing.assert_allclose(s[0], 3.0, atol=1e-12)
    np.testing.assert_allclose(s[1], 1.0 / 2.0, atol=1e-12)  # 1/(Q+1), Q=1

    r13 = ed.ed_block(6, 15, two_lz=0)  # nu=1/3 production block
    s13 = ed.structure_factor(r13, 15, lmax=2)
    np.testing.assert_allclose(s13[0], 6.0, atol=1e-10)
    np.testing.assert_allclose(s13[1], 1.0 / 8.5, atol=1e-10)  # 1/(Q+1), Q=7.5


def test_pair_correlation_curve_requires_l0():
    res = ed.ed_block(6, 16, two_lz=0)  # quasihole block: L = 3 ground state
    with pytest.raises(ValueError, match="L=0"):
        ed.pair_correlation_curve(res, 16)


def test_lz_sectors_consistent():
    """E0 over Lz sectors: minimum at Lz=0 and excited multiplets reappear.

    Every L multiplet with L >= |Lz| contributes one state per sector, so the
    sorted Lz=1 spectrum must interlace into the Lz=0 spectrum: each Lz=1
    eigenvalue appears (to 1e-10) among the Lz=0 eigenvalues with L > 0.
    """
    lz0 = ed.ed_block(3, 6, two_lz=0, num_states=10)
    lz1 = ed.ed_block(3, 6, two_lz=2, num_states=10)
    assert lz1.dim == lz0.dim - 1  # exactly one L=0 multiplet at N=3, 2Q=6
    # all Lz=1 energies are Lz=0 energies minus the single L=0 state
    basis0 = ed.lz_basis(7, 3, 0)
    h0 = ed._build_hamiltonian(ed.pair_elements(6, "coulomb"), basis0)
    e0 = np.sort(np.linalg.eigvalsh(h0))
    basis1 = ed.lz_basis(7, 3, 2)
    h1 = ed._build_hamiltonian(ed.pair_elements(6, "coulomb"), basis1)
    e1 = np.sort(np.linalg.eigvalsh(h1))
    for val in e1:
        assert np.min(np.abs(e0 - val)) < 1e-9


def test_lz_block_dim_matches_enumeration():
    """Counting-DP block dimension equals the enumerated basis size.

    The DP is the feasibility guard for the magnetoroton driver and the
    ed_overlap estimator (the full lz_basis walk is 13M combinations at the
    N=10 production block), so it must agree exactly with the enumeration
    wherever enumeration is cheap — including odd 2Lz (empty for these
    parities) and out-of-range sectors.
    """
    for n_orb, nelec in [(7, 3), (10, 4), (16, 6)]:
        for two_lz in range(-2 * n_orb, 2 * n_orb + 1):
            assert ed.lz_block_dim(n_orb, nelec, two_lz) == len(
                ed.lz_basis(n_orb, nelec, two_lz)
            ), (n_orb, nelec, two_lz)

"""Exact identities pinning the single-mode-approximation (GMP) machinery.

``observables.ed.sma_spectrum`` builds the LLL-projected density multipole
``rho_LM`` in the occupation basis and measures the classic magnetoroton
upper bound on the exact ground state.  Every test here is a mathematical
identity of that construction, not a snapshot:

* ``sbar(1) = 0``: within the LLL the projected position operator is
  ``L_i / (Q + 1)``, so ``rho_1M ~ (L_tot)_M`` annihilates any ``L = 0``
  ground state — the sphere version of ``q -> 0`` incompressibility.
* ``M``-independence of ``sbar`` and the SMA gap (Wigner-Eckart).
* ``rho_LM |0>`` is a *pure* ``L`` multiplet (rank-``L`` tensor on a scalar).
* The SMA energy is a variational upper bound in its block.
* For the harmonic interaction the LLL Hamiltonian is an exact function of
  total ``L^2`` (see ``ed.py`` module docstring), so the SMA is *exact*:
  ``Delta_SMA(L) = L(L+1) / (2Q(Q+1))`` in closed form.
"""

import numpy as np
import pytest

from deephall_tpu.observables import ed

N, TWO_Q = 4, 9  # nu=1/3 Laughlin flux at N=4: small, fully representative


@pytest.fixture(scope="module")
def coulomb_sma():
    return ed.sma_spectrum(N, TWO_Q, lmax=4)


def test_sbar1_vanishes_incompressibility(coulomb_sma):
    assert abs(coulomb_sma[0]["sbar"]) < 1e-12
    assert coulomb_sma[0]["sma_gap"] is None


def test_sbar_positive_beyond_l1(coulomb_sma):
    for row in coulomb_sma[1:]:
        assert row["sbar"] > 1e-6
        assert row["sma_gap"] is not None and row["sma_gap"] > 0.0


def test_m_independence():
    by_m = [
        ed.sma_spectrum(N, TWO_Q, lmax=3, mval=m) for m in (0, 1, None)
    ]
    for rows in by_m[1:]:
        for a, b in zip(by_m[0], rows):
            assert a["sbar"] == pytest.approx(b["sbar"], abs=1e-10)
            if a["sma_gap"] is not None:
                assert a["sma_gap"] == pytest.approx(b["sma_gap"], abs=1e-10)


def test_sma_state_is_pure_multiplet():
    """``rho_LM |0>`` carries exactly ``L^2 = L(L+1)``."""
    n_orb = TWO_Q + 1
    v4 = ed.pair_elements(TWO_Q)
    ground = ed.ed_block(N, TWO_Q, two_lz=0, num_states=1, v4=v4)
    elems = ed.y_matrix_elements(TWO_Q)
    for lval in (2, 3, 4):
        dst_basis = ed.lz_basis(n_orb, N, 2 * lval)
        dst_index = {occ: r for r, occ in enumerate(dst_basis)}
        v = ed._apply_one_body(
            elems[(lval, lval)], lval, ground.basis, dst_index,
            ground.ground_state,
        )
        l2 = float(v @ ed._apply_total_l2(TWO_Q, dst_basis, v)) / float(v @ v)
        assert l2 == pytest.approx(lval * (lval + 1), abs=1e-8)


def test_sma_gap_is_upper_bound(coulomb_sma):
    """SMA energy >= the exact lowest energy of its (pure-L) sector."""
    e0 = float(ed.ed_block(N, TWO_Q, two_lz=0, num_states=1).energies[0])
    for row in coulomb_sma[1:]:
        lval = row["l"]
        block = ed.ed_block(N, TWO_Q, two_lz=2 * lval, num_states=8)
        # lowest eigenstate of the block with L^2 = L(L+1): the bound is
        # against the L-multiplet member, which the SMA state purely is
        exact = None
        for k in range(len(block.energies)):
            if abs(ed.state_l2(block, TWO_Q, k) - lval * (lval + 1)) < 0.5:
                exact = float(block.energies[k])
                break
        assert exact is not None
        assert row["sma_gap"] >= (exact - e0) - 1e-10


def test_sma_exact_for_harmonic_interaction():
    """H_harmonic is a function of L^2 within the LLL, so SMA is exact:
    ``Delta(L) = L(L+1) / (2 Q (Q+1))``."""
    q_half = TWO_Q / 2.0
    rows = ed.sma_spectrum(N, TWO_Q, lmax=4, interaction="harmonic")
    for row in rows[1:]:
        lval = row["l"]
        expect = lval * (lval + 1) / (2.0 * q_half * (q_half + 1.0))
        assert row["sma_gap"] == pytest.approx(expect, abs=1e-9)

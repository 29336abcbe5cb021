"""Native ED backend (observables/ed_native.py) pinned against the Python path.

The C++ matvec must reproduce the dense NumPy Hamiltonian exactly — same
fermionic sign convention, same antisymmetrized elements, same basis order —
so these tests assert eigenvalue agreement at 1e-10 and raw matvec agreement
at machine precision on blocks both paths can handle.
"""

import shutil

import numpy as np
import pytest

from deephall_tpu.observables import ed

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain in this environment"
)


@pytest.fixture(scope="module")
def ed_native():
    from deephall_tpu.observables import ed_native as m

    return m


def test_basis_masks_match_dense_enumeration(ed_native):
    for n_orb, nelec, two_lz in [(7, 3, 0), (10, 4, 2), (16, 6, 0)]:
        masks = ed_native.lz_basis_masks(n_orb, nelec, two_lz)
        expected = sorted(
            sum(1 << i for i in occ) for occ in ed.lz_basis(n_orb, nelec, two_lz)
        )
        assert masks.tolist() == expected


def test_matvec_matches_dense_hamiltonian(ed_native):
    nelec, two_q = 4, 9
    v4 = ed.pair_elements(two_q, "coulomb")
    basis = ed.lz_basis(two_q + 1, nelec, 0)
    h = ed._build_hamiltonian(v4, basis)
    # dense basis is itertools order; native masks are ascending — build the
    # permutation through the mask values
    masks = ed_native.lz_basis_masks(two_q + 1, nelec, 0)
    mask_of = [sum(1 << i for i in occ) for occ in basis]
    order = {int(m): r for r, m in enumerate(masks)}
    p = np.array([order[m] for m in mask_of])  # dense row -> native row
    block = ed_native.NativeBlock(two_q + 1, masks, v4)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = rng.normal(size=len(basis))
        y_dense = h @ x
        x_native = np.zeros_like(x)
        x_native[p] = x
        y_native = block.matvec(x_native)
        np.testing.assert_allclose(y_native[p], y_dense, atol=1e-12)


def test_lanczos_matches_dense_spectrum(ed_native):
    res_n = ed_native.ed_ground_lanczos(6, 15, two_lz=0, num_states=3, tol=1e-12)
    res_d = ed.ed_block(6, 15, two_lz=0)
    np.testing.assert_allclose(res_n.energies, res_d.energies[:3], atol=1e-9)
    assert abs(res_n.ground_l2) < 1e-8
    assert res_n.dim == res_d.dim


def test_lanczos_hardcore_zero_mode(ed_native):
    v4 = ed.hardcore_v1_elements(9)
    res = ed_native.ed_ground_lanczos(4, 9, two_lz=0, v4=v4, tol=1e-12)
    assert abs(res.energies[0]) < 1e-9
    assert abs(res.ground_l2) < 1e-7

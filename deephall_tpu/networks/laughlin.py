"""Analytic Laughlin / composite-fermion wavefunctions on the monopole sphere.

Capability parity with the reference (``/root/reference/deephall/networks/laughlin.py``):
composite-fermion states at effective flux ``Q1 = Q - p (N - 1)`` with ``p = cf_flux``,
covering the ground state (N = 2 Q1 + 1), one quasihole (N = 2 Q1) and one quasiparticle
(N = 2 Q1 + 2, lowest-Landau-level projected via the u* -> d/du, v* -> d/dv derivative
trick), with a selectable Lz for the excitation.

Beyond the reference: filled-Lambda-level Jain states ``nu = n/(2n+1)`` for
``N = n (2 Q1 + n)`` — the reference names 2/5 as a target filling
(``/root/reference/README.md:9``) but ships no analytic wavefunction for any
Jain state. n = 2 (nu = 2/5) uses the hand-derived one-derivative projection;
n = 3 (nu = 3/7, e.g. N = 12 at 2Q = 23) uses a general construction: the
monopole harmonics of each Lambda level are expanded into
``u^a v^b (u*)^c (v*)^d`` monomials by exact integer lowering-operator algebra
(highest weight ``u^(2Q1+n') (v*)^n'``, swept down with
``L- = v d/du - u* d/dv*``), and the Jain-Kamilla projection replaces
``(u*)^c (v*)^d -> d^c/du^c d^d/dv^d`` acting on the attached-flux Jastrow.

Used both as a standalone (parameter-free) wavefunction for inference runs and as the
overlap target for the trained Psiformer.
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn
from jax import numpy as jnp

from deephall_tpu.geometry import spinors
from deephall_tpu.ops.slogdet import signed_logsumdet


def lambda_level_terms(two_q1: int, level: int) -> list[list[tuple[float, int, int, int, int]]]:
    """Monomial expansion of one composite-fermion Lambda level's orbitals.

    At monopole charge ``Q1 = two_q1 / 2`` the ``level``-th Lambda level carries
    angular momentum ``l = Q1 + level``. Its top state ``u^(2Q1+level) (v*)^level``
    is annihilated by ``L+ = u d/dv - v* d/du*``; repeatedly applying
    ``L- = v d/du - u* d/dv*`` sweeps out the full multiplet with exact integer
    coefficients (no closed-form monopole-harmonic coefficient tables needed).

    Returns one term list per orbital (m = l down to -l), each term
    ``(coef, a, b, c, d)`` meaning ``coef * u^a v^b (u*)^c (v*)^d``, with the
    coefficients of each orbital rescaled to max |coef| = 1 (a per-determinant-
    column constant, physically irrelevant) so factorial growth never reaches
    the f32 evaluation.
    """
    state: dict[tuple[int, int, int, int], int] = {(two_q1 + level, 0, 0, level): 1}
    orbitals = []
    for _ in range(two_q1 + 2 * level + 1):  # 2l + 1 members
        scale = max(abs(c) for c in state.values())
        orbitals.append([(c / scale, *k) for k, c in sorted(state.items())])
        lowered: dict[tuple[int, int, int, int], int] = {}
        for (a, b, c, d), coef in state.items():
            if a > 0:
                key = (a - 1, b + 1, c, d)
                lowered[key] = lowered.get(key, 0) + coef * a
            if d > 0:
                key = (a, b, c + 1, d - 1)
                lowered[key] = lowered.get(key, 0) - coef * d
        state = {k: c for k, c in lowered.items() if c != 0}
    assert not state, "lowering past m = -l must annihilate the state"
    return orbitals


class Laughlin(nn.Module):
    """Laughlin/CF wavefunction for ground or quasiparticle/quasihole states."""

    nspins: tuple[int, int]
    flux: float

    cf_flux: int = 1
    "Flux p attached to each composite fermion."

    excitation_lz: float = 0
    "Lz of the quasiparticle/quasihole state."

    def setup(self):
        nelec = sum(self.nspins)
        self.Q1 = self.flux / 2 - self.cf_flux * (nelec - 1)
        if nelec == 2 * self.Q1 + 1:  # Ground state
            self.cf_orbitals = self.full_orbitals
        elif nelec == 2 * self.Q1:  # Quasihole
            self._check_lz()
            assert -abs(self.Q1) <= self.excitation_lz <= abs(self.Q1)
            self.cf_orbitals = self.quasihole_orbitals
        elif nelec == 2 * self.Q1 + 2:  # Quasiparticle
            self._check_lz()
            assert -abs(self.Q1) - 1 <= self.excitation_lz <= abs(self.Q1) + 1
            self.cf_orbitals = self.quasiparticle_orbitals
        elif nelec == 4 * self.Q1 + 4:  # Jain nu=2/5: two filled Lambda levels
            self.cf_orbitals = self.jain_two_level_orbitals
        elif nelec == 6 * self.Q1 + 9:  # Jain nu=3/7: three filled Lambda levels
            self.n_levels = 3
            self.cf_orbitals = self.jain_orbitals
        else:
            raise ValueError("Filling not supported")

    def _check_lz(self):
        """Ensure the requested Lz is attainable for the excited state."""
        diff = self.excitation_lz - self.Q1
        assert int(diff) == diff, f"Impossible Lz={self.excitation_lz} for excitation"

    def __call__(self, electrons):
        # Add the determinant-expansion axis expected by signed_logsumdet.
        return signed_logsumdet(self.orbitals(electrons)[..., None, :, :])

    def orbitals(self, electrons):
        theta, phi = electrons[..., 0], electrons[..., 1]
        u, v = spinors(theta, phi)
        return self.cf_orbitals(u[..., None], v[..., None])

    def _pair_jastrow(self, u, v):
        """prod_j (u_i v_j - u_j v_i) with the diagonal masked to 1."""
        u_row = jnp.swapaxes(u, -1, -2)  # [..., 1, N]
        v_row = jnp.swapaxes(v, -1, -2)
        element = u * v_row - u_row * v + jnp.eye(u.shape[-2])
        return element, jnp.prod(element, axis=-1, keepdims=True)

    def full_orbitals(self, u, v):
        Q = self.Q1
        m = jnp.arange(-Q, Q + 1)
        _, jastrow = self._pair_jastrow(u, v)
        return u ** (Q + m) * v ** (Q - m) * jastrow

    def quasihole_orbitals(self, u, v):
        Q = self.Q1
        # Remove the m = -excitation_lz LLL orbital: enumerate from both ends.
        m = jnp.concatenate(
            [
                jnp.arange(-Q, -self.excitation_lz),
                jnp.arange(Q, -self.excitation_lz, -1),
            ]
        )
        _, jastrow = self._pair_jastrow(u, v)
        return u ** (Q + m) * v ** (Q - m) * jastrow

    def quasiparticle_orbitals(self, u, v):
        Q = self.Q1
        m = jnp.arange(-Q, Q + 1)
        orbitals = u ** (Q + m) * v ** (Q - m)

        element, jastrow = self._pair_jastrow(u, v)
        u_row = jnp.swapaxes(u, -1, -2)
        v_row = jnp.swapaxes(v, -1, -2)
        # LLL projection: u* -> d/du, v* -> d/dv acting on the Jastrow product.
        jastrow_dv = jastrow * (jnp.sum(-u_row / element, axis=-1, keepdims=True) + u)
        jastrow_du = jastrow * (jnp.sum(v_row / element, axis=-1, keepdims=True) - v)

        m1 = self.excitation_lz
        excited = (u ** (Q + m1) * v ** (Q - m1)) * (
            (Q + 1 + m1) * v * jastrow_dv - (Q + 1 - m1) * u * jastrow_du
        )
        return jnp.concatenate([orbitals * jastrow, excited], axis=-1)

    def jain_two_level_orbitals(self, u, v):
        """Two filled composite-fermion Lambda levels: the Jain nu=2/5 state.

        The lowest level (l = Q1, 2 Q1 + 1 orbitals) is the ground-state
        construction; the second level (l = Q1 + 1, 2 Q1 + 3 orbitals) applies
        the quasiparticle LLL projection to every member m1 of the shell, so
        N = 4 Q1 + 4 in total. A filled-shell state is rotationally invariant
        and lives entirely in the LLL after projection, giving the exact
        oracles L^2 = 0 and KE = N/2 (pinned in ``tests/test_features.py``).

        At the shell edges m1 = +-(Q1 + 1) one of the two projected terms has
        coefficient zero alongside a negative monomial exponent; the exponent
        is clamped (the term vanishes identically either way) so that
        theta = 0 / pi configurations stay finite.
        """
        Q = self.Q1
        m0 = jnp.arange(-Q, Q + 1)
        element, jastrow = self._pair_jastrow(u, v)
        u_row = jnp.swapaxes(u, -1, -2)
        v_row = jnp.swapaxes(v, -1, -2)
        jastrow_dv = jastrow * (jnp.sum(-u_row / element, axis=-1, keepdims=True) + u)
        jastrow_du = jastrow * (jnp.sum(v_row / element, axis=-1, keepdims=True) - v)

        m1 = np.arange(-(Q + 1), Q + 2)
        coef_v = Q + 1 + m1  # multiplies the v * d/dv term
        coef_u = Q + 1 - m1  # multiplies the u * d/du term
        exp_u = np.where(coef_v > 0, Q + m1, 0)
        exp_v = np.where(coef_u > 0, Q - m1, 0)
        excited = (coef_v * u**exp_u * v ** (Q + 1 - m1)) * jastrow_dv - (
            coef_u * u ** (Q + m1 + 1) * v**exp_v
        ) * jastrow_du
        lowest = u ** (Q + m0) * v ** (Q - m0) * jastrow
        return jnp.concatenate([lowest, excited], axis=-1)

    def _jastrow_derivatives(self, u, v):
        """Jain-Kamilla derivative family of the attached-flux Jastrow.

        Returns ``{(c, d): d^c/du^c d^d/dv^d prod_j (u v_j - u_j v)}`` up to
        total order 2 (three Lambda levels), per particle. With
        ``e_ij = u_i v_j - u_j v_i`` the logarithmic derivatives are power
        sums — ``dJ/du = J sum_j v_j/e_ij``, ``dJ/dv = -J sum_j u_j/e_ij`` —
        and the second order follows by one more product rule. The diagonal
        ``e_ii = 1`` entries of :meth:`_pair_jastrow` contribute exactly
        ``v_i``, ``u_i``, ``v_i^2`` ... to the raw sums and are subtracted.
        """
        element, jastrow = self._pair_jastrow(u, v)
        u_row = jnp.swapaxes(u, -1, -2)
        v_row = jnp.swapaxes(v, -1, -2)
        rv = v_row / element
        ru = u_row / element
        sv = jnp.sum(rv, axis=-1, keepdims=True) - v
        su = jnp.sum(ru, axis=-1, keepdims=True) - u
        sv2 = jnp.sum(rv * rv, axis=-1, keepdims=True) - v * v
        su2 = jnp.sum(ru * ru, axis=-1, keepdims=True) - u * u
        suv = jnp.sum(ru * rv, axis=-1, keepdims=True) - u * v
        return {
            (0, 0): jastrow,
            (1, 0): jastrow * sv,
            (0, 1): -jastrow * su,
            (2, 0): jastrow * (sv * sv - sv2),
            (0, 2): jastrow * (su * su - su2),
            (1, 1): jastrow * (suv - su * sv),
        }

    def jain_orbitals(self, u, v):
        """``n_levels`` filled CF Lambda levels (Jain ``nu = n/(2n+1)``).

        Each Lambda-level orbital is a :func:`lambda_level_terms` monomial sum;
        the Jain-Kamilla LLL projection replaces ``(u*)^c (v*)^d`` by
        ``d^c/du^c d^d/dv^d`` acting on the per-particle Jastrow only (the
        same simplification as the hand-derived one- and two-level paths,
        which this generalizes).
        """
        two_q1 = int(round(2 * self.Q1))
        assert two_q1 == 2 * self.Q1, "2*Q1 must be integral"
        jd = self._jastrow_derivatives(u, v)
        columns = []
        for level in range(self.n_levels):
            for terms in lambda_level_terms(two_q1, level):
                phi = sum(coef * u**a * v**b * jd[(c, d)] for coef, a, b, c, d in terms)
                columns.append(phi)
        return jnp.concatenate(columns, axis=-1)

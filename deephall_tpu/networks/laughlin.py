"""Analytic Laughlin / composite-fermion wavefunctions on the monopole sphere.

Capability parity with the reference (``/root/reference/deephall/networks/laughlin.py``):
composite-fermion states at effective flux ``Q1 = Q - p (N - 1)`` with ``p = cf_flux``,
covering the ground state (N = 2 Q1 + 1), one quasihole (N = 2 Q1) and one quasiparticle
(N = 2 Q1 + 2, lowest-Landau-level projected via the u* -> d/du, v* -> d/dv derivative
trick), with a selectable Lz for the excitation.

Beyond the reference: the two-filled-Lambda-level Jain state (N = 4 Q1 + 4), the
nu = 2/5 analytic anchor — the reference names 2/5 as a target filling
(``/root/reference/README.md:9``) but ships no analytic wavefunction for it.

Used both as a standalone (parameter-free) wavefunction for inference runs and as the
overlap target for the trained Psiformer.
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn
from jax import numpy as jnp

from deephall_tpu.geometry import spinors
from deephall_tpu.ops.slogdet import signed_logsumdet


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

"""Monopole spherical harmonics Y_{q,l,m} (explicit finite-sum form).

Used by the one-body reduced density matrix estimator
(reference ``/root/reference/deephall/netobs_bridge/observables/one_rdm.py:32-55``).
"""

from __future__ import annotations

import math

import numpy as np
from jax import numpy as jnp


def make_monopole_harm(q: float, l: float, m: float):  # noqa: E741
    """Build ``Y_qlm(electrons)`` evaluating one monopole harmonic.

    Args:
        q: Monopole strength (flux / 2).
        l: Angular momentum (l >= |q|).
        m: Azimuthal quantum number.

    Returns:
        Function mapping ``[..., 2]`` (theta, phi) to complex harmonic values.
    """

    def fact(x):
        return math.gamma(x + 1)

    norm_factor = np.sqrt(
        ((2 * l + 1) / (4 * np.pi))
        * (fact(l - m) * fact(l + m))
        / (fact(l - q) * fact(l + q))
    )
    s = np.arange(l - m + 1)
    sum_factors = jnp.asarray(
        (-1.0) ** (l - m - s)
        * np.array([math.comb(int(l - q), int(si)) if 0 <= si <= l - q else 0.0
                    for si in s])
        * np.array(
            [
                math.comb(int(l + q), int(l - m - si))
                if 0 <= l - m - si <= l + q
                else 0.0
                for si in s
            ]
        )
    )
    s_arr = jnp.asarray(s, jnp.float32)

    def y_qlm(electrons: jnp.ndarray) -> jnp.ndarray:
        theta, phi = electrons[..., 0], electrons[..., 1]
        # Clip for numerical stability at the poles.
        x = jnp.clip(jnp.cos(theta), -1 + 1e-4, 1 - 1e-4)
        theta_part = jnp.sum(
            sum_factors
            * (1 - x[..., None]) ** (l - s_arr - (m + q) / 2)
            * (1 + x[..., None]) ** (s_arr + (m + q) / 2),
            axis=-1,
        )
        return norm_factor / 2**l * theta_part * jnp.exp(1j * m * phi)

    return y_qlm

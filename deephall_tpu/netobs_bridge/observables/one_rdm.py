"""netobs one-body RDM estimator (reference ``observables/one_rdm.py``)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.harmonics import make_monopole_harm


class OneRDM(Observable[HallSystem]):
    def shapeof(self, system) -> tuple[int, ...]:
        norbs = system["flux"] + 1
        return (norbs, norbs)


def uniform_sample(key, batch):
    key1, key2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(key1, batch, minval=-1, maxval=1))
    phi = jax.random.uniform(key2, batch, minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


class OneRDMEstimator(Estimator[HallSystem]):
    observable_type = OneRDM

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.batch_network = jax.vmap(adaptor.call_network, in_axes=(None, 0, None))
        Q = system["flux"] / 2
        self.orbitals = [make_monopole_harm(Q, Q, m) for m in np.arange(-Q, Q + 1)]
        self.batch_product = jax.jit(
            jax.vmap(self.eval_product, in_axes=(None, 0, None, 0))
        )

    def empty_val_state(
        self, steps: int
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        empty_values = {
            "one_rdm": jnp.zeros(
                (steps, *self.observable.shape), self.options.get("dtype", "complex64")
            ),
        }
        return empty_values, {}

    def eval_product(self, params, data, system, r_prime):
        nelec = len(data)
        data_prime = jnp.repeat(data[None], nelec, axis=0)
        data_prime = data_prime.at[jnp.diag_indices(nelec, 2)].set(r_prime)

        logpsi = self.adaptor.call_network(params, data, system)
        logpsi_prime = self.batch_network(params, data_prime, system)
        varphi = jnp.stack([orb(data) for orb in self.orbitals], axis=-1)
        varphi_prime = jnp.stack([orb(r_prime) for orb in self.orbitals], axis=-1)

        wf_ratio = jnp.exp(logpsi_prime - logpsi[..., None])

        # < sum_a Psi*(R'_a)/Psi*(R) phi_i(r_a) phi_j*(r_a') >
        return (4 * jnp.pi) * jnp.sum(
            wf_ratio[..., None, None]
            * varphi[..., None]
            * jnp.conj(varphi_prime)[..., None, :],
            axis=0,
        )

    def evaluate(
        self, i, params, key, data, system, state, aux_data
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del i, aux_data
        r_prime = uniform_sample(key[0], data.shape[:1])[:, None, :]
        product = self.batch_product(params, data, system, r_prime)
        return {"one_rdm": jnp.mean(product, axis=0)}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del state
        one_rdm = jnp.mean(all_values["one_rdm"], axis=0)
        return {"diagonal": jnp.diagonal(one_rdm), "trace": jnp.trace(one_rdm)}


DEFAULT = OneRDMEstimator

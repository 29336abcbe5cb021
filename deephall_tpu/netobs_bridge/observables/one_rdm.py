"""netobs 1-RDM plugin — thin shim over the shared RDM-product kernel.

Same observable as the reference plugin (``/root/reference/deephall/netobs_bridge/
observables/one_rdm.py:65-119``); the insertion-trick integrand lives once in
:func:`deephall_tpu.observables.estimators.make_rdm_product`.  Following the
reference's value contract, ``evaluate`` returns the **per-walker** product array
each step, leaving across-step statistics (means, error bars) to netobs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.estimators import (
    make_rdm_product,
    sample_insertion_points,
)


class OneRDM(Observable[HallSystem]):
    def shapeof(self, system) -> tuple[int, ...]:
        norbs = system["flux"] + 1
        return (norbs, norbs)


class OneRDMEstimator(Estimator[HallSystem]):
    observable_type = OneRDM

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.batch_product = jax.jit(make_rdm_product(adaptor.cfg, adaptor.network))

    def empty_val_state(
        self, steps: int
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        empty_values = {
            "one_rdm": jnp.zeros(
                (steps, *self.observable.shape), self.options.get("dtype", "complex64")
            ),
        }
        return empty_values, {}

    def evaluate(
        self, i, params, key, data, system, state, aux_data
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del i, system, aux_data
        walkers = jnp.reshape(data, (-1, *data.shape[-2:]))
        one_key = jnp.reshape(key, (-1, *key.shape[-1:]))[0]  # first of per-device keys
        r_prime = sample_insertion_points(one_key, walkers.shape[:1])[:, None, :]
        product = self.batch_product(params, walkers, r_prime)
        return {"one_rdm": product}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del state
        one_rdm = jnp.mean(all_values["one_rdm"], axis=0)
        return {"diagonal": jnp.diagonal(one_rdm), "trace": jnp.trace(one_rdm)}


DEFAULT = OneRDMEstimator

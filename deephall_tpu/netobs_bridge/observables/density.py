"""netobs density estimator (reference ``observables/density.py``)."""

from __future__ import annotations

from typing import Any

from jax import numpy as jnp
from netobs.observables import Estimator
from netobs.observables.density import Density

from deephall_tpu.netobs_bridge.hall_system import HallSystem


class DensityEstimator(Estimator[HallSystem]):
    observable_type = Density

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.hist_bins = self.options.get("bins", 50)

    def empty_val_state(
        self, steps: int
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del steps
        return {}, {"map": jnp.zeros(self.hist_bins)}

    def evaluate(
        self, i, params, key, data, system, state, aux_data
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del i, params, system, aux_data, key
        theta = jnp.reshape(data[..., 0], (-1,))
        hist, _ = jnp.histogram(theta, self.hist_bins, range=(0.0, float(jnp.pi)))
        state["map"] += hist
        return {}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del all_values, state
        return {}


DEFAULT = DensityEstimator

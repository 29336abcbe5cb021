"""netobs density plugin — thin shim over the shared density kernel.

Same observable as the reference plugin (``/root/reference/deephall/netobs_bridge/
observables/density.py:24-48``); the histogram physics lives once in
:func:`deephall_tpu.observables.estimators.density_histogram`.
"""

from __future__ import annotations

from typing import Any

from jax import numpy as jnp
from netobs.observables import Estimator
from netobs.observables.density import Density

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.estimators import density_histogram


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
        del i, params, key, system, aux_data
        walkers = jnp.reshape(data, (-1, *data.shape[-2:]))
        state = {"map": state["map"] + density_histogram(walkers, self.hist_bins)}
        return {}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del all_values, state
        return {}


DEFAULT = DensityEstimator

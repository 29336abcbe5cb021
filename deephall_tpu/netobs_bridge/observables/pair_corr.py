"""netobs pair-correlation plugin — thin shim over the shared pair kernel.

Same observable as the reference plugin (``/root/reference/deephall/netobs_bridge/
observables/pair_corr.py:29-64``); the weighted-histogram physics (including the
1e-6 sin floor, this framework's single deliberate deviation) lives once in
:func:`deephall_tpu.observables.estimators.pair_histogram`, so the netobs surface
and the standalone runner cannot disagree.
"""

from __future__ import annotations

from typing import Any

from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.estimators import pair_histogram


class PairCorrelation(Observable):
    def shapeof(self, system) -> tuple[int, ...]:
        return ()


class PairCorrelationEstimator(Estimator[HallSystem]):
    observable_type = PairCorrelation

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.bins = self.options.get("bins", 200)

    def empty_val_state(
        self, steps: int
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del steps
        return {}, {"pair_corr": jnp.zeros(self.bins)}

    def evaluate(
        self, i, params, key, data, system, state, aux_data
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del i, params, key, system, aux_data
        walkers = jnp.reshape(data, (-1, *data.shape[-2:]))
        state = {
            # Accumulated without the 1/steps normalisation, as in the reference.
            "pair_corr": state["pair_corr"] + pair_histogram(walkers, self.bins)
        }
        return {}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del all_values, state
        return {}


DEFAULT = PairCorrelationEstimator

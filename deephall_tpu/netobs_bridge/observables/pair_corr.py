"""netobs pair-correlation estimator (reference ``observables/pair_corr.py``)."""

from __future__ import annotations

from typing import Any

from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.geometry import pairwise_cos
from deephall_tpu.netobs_bridge.hall_system import HallSystem


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
        del i, params, aux_data, key, system
        data = jnp.reshape(data, (-1, *data.shape[-2:]))
        batch_size, nelec, _ = data.shape
        cos12 = pairwise_cos(data)
        iu = jnp.triu_indices(nelec, 1)
        theta12 = jnp.arccos(jnp.clip(cos12[:, iu[0], iu[1]], -1, 1)).reshape(-1)
        to_add, _ = jnp.histogram(
            theta12, self.bins, range=(0, float(jnp.pi)), weights=1 / jnp.sin(theta12)
        )
        # Norm factor over evaluation steps is not divided here (same as reference).
        state["pair_corr"] += to_add * 4 * self.bins / batch_size / nelec**2 / jnp.pi
        return {}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del all_values, state
        return {}


DEFAULT = PairCorrelationEstimator

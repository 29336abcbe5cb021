"""netobs Laughlin-overlap plugin — thin shim over the shared ratio kernel.

Same observable as the reference plugin (``/root/reference/deephall/netobs_bridge/
observables/overlap.py:31-70``); the importance-ratio physics lives once in
:func:`deephall_tpu.observables.estimators.make_overlap_ratios`.  Following the
reference's value contract, ``evaluate`` returns the **per-walker** ratio arrays
each step, leaving across-step statistics to netobs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.estimators import make_overlap_ratios


class Overlap(Observable):
    def shapeof(self, system) -> tuple[int, ...]:
        return ()


class OverlapEstimator(Estimator[HallSystem]):
    observable_type = Overlap

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.ratios = jax.jit(make_overlap_ratios(adaptor.cfg, adaptor.network))

    def empty_val_state(
        self, steps: int
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        empty_values = {
            "ratio": jnp.zeros(steps, "complex64"),
            "ratio_square": jnp.zeros(steps),
        }
        return empty_values, {}

    def evaluate(
        self, i, params, key, data, system, state, aux_data
    ) -> tuple[dict[str, jnp.ndarray], dict[str, Any]]:
        del i, key, system, aux_data
        walkers = jnp.reshape(data, (-1, *data.shape[-2:]))
        ratio, ratio_square = self.ratios(params, walkers)
        return {"ratio": ratio, "ratio_square": ratio_square}, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del state
        overlap = jnp.abs(jnp.nanmean(all_values["ratio"])) ** 2 / jnp.nanmean(
            all_values["ratio_square"]
        )
        return {"overlap": overlap}


DEFAULT = OverlapEstimator

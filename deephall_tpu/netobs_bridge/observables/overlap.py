"""netobs Laughlin-overlap estimator (reference ``observables/overlap.py``)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax import numpy as jnp
from netobs.observables import Estimator, Observable

from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.networks import make_network


class Overlap(Observable):
    def shapeof(self, system) -> tuple[int, ...]:
        return ()


class OverlapEstimator(Estimator[HallSystem]):
    observable_type = Overlap

    def __init__(self, adaptor, system, estimator_options, observable_options):
        super().__init__(adaptor, system, estimator_options, observable_options)
        self.batch_network = jax.vmap(adaptor.call_network, in_axes=(None, 0, None))
        cfg = adaptor.cfg
        laughlin = make_network(
            cfg.system, dataclasses.replace(cfg.network, type="laughlin")
        )
        self.batch_laughlin = jax.jit(jax.vmap(laughlin.apply, in_axes=(None, 0)))

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
        del i, aux_data, key
        logpsi = self.batch_network(params, data, system)
        logphi = self.batch_laughlin({}, data)
        shift = jnp.mean(logphi - logpsi)
        ratio = jnp.exp(logphi - logpsi - shift)
        return {
            "ratio": jnp.nanmean(ratio),
            "ratio_square": jnp.nanmean(jnp.abs(ratio) ** 2),
        }, state

    def digest(self, all_values, state) -> dict[str, jnp.ndarray]:
        del state
        ratio = all_values["ratio"]
        ratio_square = all_values["ratio_square"]
        overlap = jnp.abs(jnp.nanmean(ratio)) ** 2 / jnp.nanmean(ratio_square)
        return {"overlap": overlap}


DEFAULT = OverlapEstimator

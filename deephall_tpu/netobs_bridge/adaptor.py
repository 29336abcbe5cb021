"""NetObs NetworkAdaptor for deephall-tpu checkpoints.

Bridges trained runs into the external ``netobs`` analysis CLI (reference
``/root/reference/deephall/netobs_bridge/adaptor.py``): restores the network from the
``config.yml`` beside a checkpoint, exposes jitted kinetic/potential closures and a
walking step reusing the framework's MCMC sampler.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, TypedDict

import jax
from jax import numpy as jnp
from jax.tree_util import register_pytree_node_class
from netobs.adaptors import NetworkAdaptor, WalkingStep

from deephall_tpu.config import Config
from deephall_tpu.hamiltonian import make_local_kinetic_energy, make_potential
from deephall_tpu.log import AnyPath, LogManager
from deephall_tpu.mcmc import make_mcmc_step
from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.networks import make_network


class DeepHallAuxData(TypedDict):
    mcmc_width: jnp.ndarray


@register_pytree_node_class
class DeepHallAdaptor(NetworkAdaptor[HallSystem]):
    def __init__(self, config: Any, args: list[str]) -> None:
        super().__init__(config, args)

    def restore(
        self, ckpt_file: str | None = None
    ) -> tuple[Any, jnp.ndarray, HallSystem, Any]:
        if ckpt_file is None:
            raise ValueError("Must specify a checkpoint")
        import yaml

        config_path = AnyPath(str(ckpt_file).rsplit("/", 1)[0]) / "config.yml"
        with config_path.open() as f:
            raw = yaml.safe_load(f)
        raw.pop("git_commit", None)
        self.cfg = cfg = Config.from_dict(raw)
        model = make_network(cfg.system, cfg.network)
        self.network = jax.jit(model.apply)
        Q = cfg.system.flux / 2
        radius = jnp.asarray(cfg.system.radius or jnp.sqrt(Q))
        self.kinetic_energy = make_local_kinetic_energy(self.network, Q, radius)
        self.potential_energy = make_potential(cfg.system.interaction_type, Q, radius)
        _, state = LogManager.restore_checkpoint(ckpt_file)

        return (
            state.params,
            jnp.asarray(state.data),
            HallSystem(spins=list(cfg.system.nspins), ndim=2, flux=cfg.system.flux),
            DeepHallAuxData(mcmc_width=jnp.asarray(state.mcmc_width)),
        )

    def call_signed_network(
        self, params: jnp.ndarray, electrons: jnp.ndarray, system: HallSystem
    ):
        del system
        return jnp.array(1.0), self.network(params, electrons)

    def make_walking_step(
        self, batch_log_psi: Callable, steps: int, system: HallSystem
    ) -> WalkingStep[DeepHallAuxData]:
        del system
        mcmc_step = jax.jit(
            make_mcmc_step(
                lambda params, data: batch_log_psi(params, data, None), steps=steps
            )
        )

        def walk(
            key: jnp.ndarray,
            params: jnp.ndarray,
            electrons: jnp.ndarray,
            aux_data: DeepHallAuxData,
        ) -> tuple[jnp.ndarray, DeepHallAuxData]:
            new_data, _ = mcmc_step(params, electrons, key, aux_data["mcmc_width"])
            return new_data, aux_data

        return walk

    def call_local_kinetic_energy(
        self,
        params: jnp.ndarray,
        key: jnp.ndarray,
        electrons: jnp.ndarray,
        system: HallSystem,
    ) -> jnp.ndarray:
        del key, system
        return self.kinetic_energy(params, electrons)[0]

    def call_local_potential_energy(
        self,
        params: jnp.ndarray,
        key: jnp.ndarray,
        electrons: jnp.ndarray,
        system: HallSystem,
    ) -> jnp.ndarray:
        del params, system, key
        return self.potential_energy(electrons) * self.cfg.system.interaction_strength


DEFAULT = DeepHallAdaptor

"""NetObs NetworkAdaptor for deephall-tpu checkpoints.

Plugin surface parity with the reference bridge
(``/root/reference/deephall/netobs_bridge/adaptor.py:38-112``) — the method names
are imposed by the netobs ``NetworkAdaptor`` API — implemented on this framework's
own plumbing: run restoration is delegated to the standalone runner's
:func:`~deephall_tpu.observables.runner.load_run` (one restore path for both
analysis surfaces), matmul precision is pinned to ``highest`` on restore (local
energies and wavefunction ratios feed the physics), and the walking step is one
jitted global-mesh program rather than a pmap.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, TypedDict

import jax
from jax import numpy as jnp
from jax.tree_util import register_pytree_node_class
from netobs.adaptors import NetworkAdaptor, WalkingStep

from deephall_tpu.hamiltonian import make_local_kinetic_energy, make_potential
from deephall_tpu.mcmc import make_mcmc_step
from deephall_tpu.netobs_bridge.hall_system import HallSystem
from deephall_tpu.observables.runner import load_run
from deephall_tpu.utils import setup_runtime


class DeepHallAuxData(TypedDict):
    mcmc_width: jnp.ndarray


@register_pytree_node_class
class DeepHallAdaptor(NetworkAdaptor[HallSystem]):
    """Expose a trained deephall-tpu run to the netobs analysis CLI."""

    def __init__(self, config: Any, args: list[str]) -> None:
        super().__init__(config, args)

    def restore(
        self, ckpt_file: str | None = None
    ) -> tuple[Any, jnp.ndarray, HallSystem, Any]:
        """Rebuild the network and sampler state from a checkpoint + config.yml.

        Args:
            ckpt_file: Path to a ``ckpt_*.npz`` (its directory must hold the
                ``config.yml`` sidecar, as written by every training run).

        Raises:
            ValueError: if no checkpoint path is given.

        Returns:
            ``(params, walkers, system, aux_data)`` in netobs's restore contract.
        """
        if ckpt_file is None:
            raise ValueError("Must specify a checkpoint")
        setup_runtime()
        cfg, model, params, data, mcmc_width = load_run(str(ckpt_file))
        self.cfg = cfg
        self.network = jax.jit(model.apply)

        Q = cfg.system.flux / 2
        radius = jnp.asarray(cfg.system.radius or jnp.sqrt(Q))
        self.kinetic_energy = make_local_kinetic_energy(self.network, Q, radius)
        self.potential_energy = make_potential(cfg.system.interaction_type, Q, radius)

        system = HallSystem(
            spins=list(cfg.system.nspins), ndim=2, flux=cfg.system.flux
        )
        aux = DeepHallAuxData(mcmc_width=jnp.asarray(mcmc_width))
        return params, jnp.asarray(data), system, aux

    def call_signed_network(
        self, params: jnp.ndarray, electrons: jnp.ndarray, system: HallSystem
    ):
        """Log-wavefunction with a trivial sign (log psi is already complex)."""
        del system
        return jnp.array(1.0), self.network(params, electrons)

    def make_walking_step(
        self, batch_log_psi: Callable, steps: int, system: HallSystem
    ) -> WalkingStep[DeepHallAuxData]:
        """One jitted Metropolis sweep reusing the framework sampler."""
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
            moved, _pmove = mcmc_step(params, electrons, key, aux_data["mcmc_width"])
            return moved, aux_data

        return walk

    def call_local_kinetic_energy(
        self,
        params: jnp.ndarray,
        key: jnp.ndarray,
        electrons: jnp.ndarray,
        system: HallSystem,
    ) -> jnp.ndarray:
        """Monopole kinetic energy of one configuration (observables discarded)."""
        del key, system
        kinetic, _observables = self.kinetic_energy(params, electrons)
        return kinetic

    def call_local_potential_energy(
        self,
        params: jnp.ndarray,
        key: jnp.ndarray,
        electrons: jnp.ndarray,
        system: HallSystem,
    ) -> jnp.ndarray:
        """Scaled interaction energy of one configuration."""
        del params, key, system
        return self.potential_energy(electrons) * self.cfg.system.interaction_strength


DEFAULT = DeepHallAdaptor

"""Shared type protocols and containers.

Mirrors the reference's public type surface (``/root/reference/deephall/types.py:22-82``)
so downstream code (observables, user scripts) can type against the same names.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol, TypedDict

from jax import numpy as jnp

ArrayTree = Any  # pytree of arrays
PRNGKey = jnp.ndarray


class AngularMomenta(TypedDict):
    """Angular momenta, computed alongside the kinetic energy."""

    angular_momentum_z: jnp.ndarray
    angular_momentum_z_square: jnp.ndarray
    angular_momentum_square: jnp.ndarray


class OtherObservables(AngularMomenta):
    """Everything else produced while computing the local energy."""

    kinetic: jnp.ndarray
    potential: jnp.ndarray


class LossStats(OtherObservables):
    """Per-step training statistics.

    Excited-state runs (``system.orthogonal_states``) additionally carry a real
    ``overlap`` key: the summed normalized overlaps with the fixed lower states.
    """

    energy: jnp.ndarray
    variance: jnp.ndarray


class CheckpointState(NamedTuple):
    params: ArrayTree
    data: jnp.ndarray
    opt_state: Any
    mcmc_width: jnp.ndarray


class LocalEnergy(Protocol):
    def __call__(
        self, params: ArrayTree, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, OtherObservables]:
        """Returns the local energy of the Hamiltonian at one configuration.

        Args:
            params: network parameters.
            data: MCMC configuration ``[nelec, 2]`` (theta, phi).

        Returns:
            A tuple of the local energy and other observables (angular momenta,
            kinetic and potential energy).
        """


class LogPsiNetwork(Protocol):
    def __call__(self, params: ArrayTree, data: jnp.ndarray) -> jnp.ndarray:
        """Complex log-wavefunction for a single configuration."""


class TrainingStep(Protocol):
    def __call__(
        self,
        state: CheckpointState,
        key: PRNGKey,
        penalties: dict | None = None,
    ) -> tuple[CheckpointState, LossStats]:
        """One optimizer step.

        ``penalties`` is the optional dynamic-penalty operand dict
        (``system.dynamic_penalties``): traced scalar overrides for the
        penalty strengths, threaded through the compiled step so penalty
        sweeps share one executable.
        """


class TrainingInit(Protocol):
    def __call__(self, params: ArrayTree, key: PRNGKey, data: jnp.ndarray) -> Any: ...

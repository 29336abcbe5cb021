"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("deephall")

# The walker (batch) axis. VMC is embarrassingly parallel over walkers: this is the only
# scaling axis in the reference as well (SURVEY §2 parallelism census), implemented there
# as pmap over "qmc_pmap_axis".
DATA_AXIS = "data"

_MESH: Mesh | None = None


def initialize_distributed() -> None:
    """Initialise multi-host JAX if the standard cluster env vars are present.

    On a multi-host TPU pod slice each process should call this before any other JAX
    API. Single-host runs (including CPU test meshes) are a no-op. The reference has no
    multi-host support at all (single-process pmap only); here it comes for free from
    the global mesh design: collectives ride ICI within a slice and DCN across slices.
    """
    if jax.process_count() > 1:
        return  # already initialised
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator and os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        logger.info(
            "Initialised JAX distributed: %s processes", jax.process_count()
        )


def get_mesh(devices=None) -> Mesh:
    """Build (or fetch) the global 1-D walker mesh over all devices.

    Args:
        devices: Optional explicit device list (used by tests and multi-chip dry runs).

    Returns:
        A 1-D ``Mesh`` with axis ``"data"`` spanning the devices.
    """
    global _MESH
    if devices is not None:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if _MESH is None:
        _MESH = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    return _MESH


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for walker-major arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (parameters, widths, keys)."""
    return NamedSharding(mesh, P())


def shard_data(x, mesh: Mesh):
    """Place a walker-major array (or pytree) on the mesh, batch axis sharded."""
    return jax.device_put(x, shard_spec(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across the mesh."""
    return jax.device_put(tree, replicate_spec(mesh))

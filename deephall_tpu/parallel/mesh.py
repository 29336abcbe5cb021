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


def _int_env(name: str) -> int | None:
    value = os.environ.get(name)
    return int(value) if value is not None else None


def initialize_distributed() -> None:
    """Initialise multi-host JAX when launched in a multi-process environment.

    Must run before anything touches the backend (``jax.devices()`` /
    ``jax.process_count()`` would initialise a single-process backend and make a
    later ``jax.distributed.initialize`` fail), so the launch environment is probed
    through env vars only:

    * ``JAX_COORDINATOR_ADDRESS`` (JAX's own standard variable) plus
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` for manual launches;
    * Slurm (``SLURM_NTASKS``) and OpenMPI (``OMPI_COMM_WORLD_SIZE``) launches
      defer everything to ``jax.distributed.initialize()``'s cluster auto-detection.

    Single-host runs (including CPU test meshes) are a no-op.  The reference is
    single-process pmap only (``/root/reference/deephall/constants.py:29-41``);
    here multi-host falls out of the global-mesh design once the processes
    rendezvous: collectives ride ICI within a slice and DCN across slices.
    Demonstrated end-to-end by ``tests/test_distributed.py``: a 2-process
    training loop with checkpoint save (cross-process ``process_allgather``),
    restart/resume, and bit-exact global statistics against a single-process
    run on the same 2-device mesh.
    """
    if jax.distributed.is_initialized():
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # coordinator_address is read from the env by jax itself; num_processes /
        # process_id come from our env vars or, failing that, cluster detection.
        jax.distributed.initialize(
            num_processes=_int_env("JAX_NUM_PROCESSES"),
            process_id=_int_env("JAX_PROCESS_ID"),
        )
    elif (
        _int_env("SLURM_NTASKS") or _int_env("OMPI_COMM_WORLD_SIZE") or 0
    ) > 1:
        jax.distributed.initialize()
    else:
        return
    logger.info(
        "Initialised JAX distributed: process %s of %s",
        jax.process_index(),
        jax.process_count(),
    )
    requested = _int_env("JAX_NUM_PROCESSES")
    if requested and jax.process_count() != requested:
        # Seen when something initialises a PJRT backend before the rendezvous
        # (e.g. an environment-injected sitecustomize registering a TPU plugin):
        # the coordinator connects but the backend keeps a single-process view.
        logger.warning(
            "Distributed rendezvous incomplete: backend sees %s processes but "
            "JAX_NUM_PROCESSES=%s. A backend was likely initialised before "
            "initialize_distributed(); collectives will NOT span hosts.",
            jax.process_count(),
            requested,
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

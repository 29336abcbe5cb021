"""TPU mesh parallelism: walker data-parallelism over ICI.

The reference scales with single-host ``jax.pmap`` replication and NCCL collectives on a
fixed axis name (``/root/reference/deephall/constants.py:29-41``).  This framework instead
uses the modern JAX SPMD stack: one global :class:`jax.sharding.Mesh` over every chip
(multi-host pods included), walker batches sharded over the ``"data"`` axis with
:class:`~jax.sharding.NamedSharding`, parameters replicated by sharding spec, and a single
``jax.jit`` per step.  Reductions are written as plain global means — XLA partitions them
into per-shard reductions plus an all-reduce over ICI, so there is no explicit
``pmap``/``pmean`` plumbing anywhere in the physics code.

Array layouts therefore carry **no leading device axis**: data is logically
``[batch, nelec, 2]`` everywhere, which also makes checkpoints device-count portable by
construction.
"""

from deephall_tpu.parallel.mesh import (
    DATA_AXIS,
    get_mesh,
    initialize_distributed,
    replicate,
    shard_data,
    shard_spec,
)

__all__ = [
    "DATA_AXIS",
    "get_mesh",
    "initialize_distributed",
    "replicate",
    "shard_data",
    "shard_spec",
]

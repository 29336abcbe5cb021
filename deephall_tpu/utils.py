"""Small shared utilities.

Includes the complex-boundary helpers: the TPU runtime here cannot transfer complex
arrays between host and device (only complex *compute* inside jit is supported), so
jitted steps return complex statistics as (real, imag) pairs and the host re-forms
Python complex numbers.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
from jax import numpy as jnp


def setup_runtime() -> None:
    """One-stop runtime setup shared by every entry point.

    Pins matmul precision to ``highest`` (local energies are second derivatives of
    the network; bf16 matmul error measurably corrupts the physics — PERF_NOTES.md)
    and enables the persistent compilation cache.  Called by the training driver,
    the observables runner, the netobs adaptor, bench.py and the profiling script so
    no analysis path can silently run lower-precision local energies.
    """
    jax.config.update("jax_default_matmul_precision", "highest")
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Enable the persistent XLA compilation cache.

    On tunnelled/remote TPU runtimes a fresh compile of the training step takes
    minutes; the on-disk cache makes reruns of the same config near-instant.
    Honours ``JAX_COMPILATION_CACHE_DIR`` if set.
    """
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class ComplexPair(NamedTuple):
    """A complex value split into real/imag leaves (safe to cross the jit boundary)."""

    real: jnp.ndarray
    imag: jnp.ndarray


def pack_complex(tree: Any) -> Any:
    """Replace complex leaves with ComplexPair(real, imag). Use inside jit outputs."""
    return jax.tree.map(
        lambda x: ComplexPair(x.real, x.imag) if jnp.iscomplexobj(x) else x, tree
    )


def unpack_complex(tree: Any) -> Any:
    """Re-form complex numpy arrays from ComplexPair leaves (host side)."""
    import numpy as np

    return jax.tree.map(
        lambda x: np.asarray(x.real) + 1j * np.asarray(x.imag)
        if isinstance(x, ComplexPair)
        else x,
        tree,
        is_leaf=lambda x: isinstance(x, ComplexPair),
    )

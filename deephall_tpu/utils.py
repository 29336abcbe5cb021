"""Small shared utilities.

Includes the complex-boundary helpers: the TPU runtime here cannot transfer complex
arrays between host and device (only complex *compute* inside jit is supported), so
jitted steps return complex statistics as (real, imag) pairs and the host re-forms
Python complex numbers.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
from jax import numpy as jnp


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
    """Re-form complex numpy scalars from ComplexPair leaves (host side)."""
    return jax.tree.map(
        lambda x: complex(x.real, x.imag) if isinstance(x, ComplexPair) else x,
        tree,
        is_leaf=lambda x: isinstance(x, ComplexPair),
    )

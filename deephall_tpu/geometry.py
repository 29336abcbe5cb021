"""Spherical geometry helpers shared by networks, Hamiltonian and samplers.

Electron configurations are ``data[..., nelec, 2] = (theta, phi)`` on the unit sphere,
threaded by a magnetic monopole of strength ``Q = flux / 2`` (reference convention,
``/root/reference/deephall/train.py:40-54``).
"""

from __future__ import annotations

from jax import numpy as jnp


def to_cartesian(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Unit-sphere Cartesian coordinates, stacked on the last axis as (x, y, z)."""
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )


def spinors(theta: jnp.ndarray, phi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Monopole spinor coordinates ``u, v`` on the sphere.

    u = cos(theta/2) e^{+i phi/2},  v = sin(theta/2) e^{-i phi/2}
    (reference ``blocks.py:65-66``, ``laughlin.py:61-62``).
    """
    u = jnp.cos(theta / 2) * jnp.exp(0.5j * phi)
    v = jnp.sin(theta / 2) * jnp.exp(-0.5j * phi)
    return u, v


def pairwise_cos(data: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the angle between every electron pair: ``[..., nelec, nelec]``."""
    xyz = to_cartesian(data[..., 0], data[..., 1])
    return jnp.einsum("...ia,...ja->...ij", xyz, xyz)


def chord_distances(data: jnp.ndarray) -> jnp.ndarray:
    """Pairwise chord distances on the unit sphere with a safe zero diagonal.

    Matches the reference Jastrow's distance computation
    (``blocks.py:109-121``): the diagonal is masked so it stays exactly zero and
    differentiable.
    """
    xyz = to_cartesian(data[..., 0], data[..., 1])
    diff = xyz[..., None, :, :] - xyz[..., :, None, :]
    nelec = diff.shape[-2]
    eye = jnp.eye(nelec)
    # Add the identity on the diagonal so the norm's sqrt has a nonzero argument
    # (grad-safe), then zero the diagonal back out.
    safe = diff + eye[..., None]
    return jnp.linalg.norm(safe, axis=-1) * (1.0 - eye)

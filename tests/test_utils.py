"""Utility tests: complex packing, geometry identities."""

import jax
import jax.numpy as jnp
import numpy as np

from deephall_tpu.geometry import chord_distances, pairwise_cos, spinors, to_cartesian
from deephall_tpu.utils import ComplexPair, pack_complex, unpack_complex


def test_pack_unpack_roundtrip():
    tree = {"a": jnp.array([1.0 + 2.0j, 3.0 - 1.0j]), "b": jnp.array([4.0, 5.0])}
    packed = pack_complex(tree)
    assert isinstance(packed["a"], ComplexPair)
    assert not isinstance(packed["b"], ComplexPair)
    restored = unpack_complex(jax.device_get(packed))
    assert np.allclose(restored["a"], np.array([1 + 2j, 3 - 1j]))
    assert np.allclose(restored["b"], [4.0, 5.0])


def test_spinor_identity():
    """|u|^2 + |v|^2 = 1 and u v* relation to the sphere point."""
    theta = jnp.array([0.3, 1.2, 2.8])
    phi = jnp.array([-2.0, 0.5, 3.0])
    u, v = spinors(theta, phi)
    assert jnp.allclose(jnp.abs(u) ** 2 + jnp.abs(v) ** 2, 1.0, atol=1e-6)
    # z = |u|^2 - |v|^2 = cos(theta); x + iy = 2 u v*
    xyz = to_cartesian(theta, phi)
    assert jnp.allclose(jnp.abs(u) ** 2 - jnp.abs(v) ** 2, xyz[..., 2], atol=1e-6)
    w = 2 * u * jnp.conj(v)
    assert jnp.allclose(w.real, xyz[..., 0], atol=1e-6)
    assert jnp.allclose(w.imag, xyz[..., 1], atol=1e-6)


def test_chord_vs_cos():
    """chord^2 = 2 - 2 cos(theta_12) off the diagonal; exact zero diagonal."""
    key = jax.random.PRNGKey(0)
    theta = jax.random.uniform(key, (4, 5), minval=0.1, maxval=3.0)
    phi = jax.random.uniform(key, (4, 5), minval=-3.0, maxval=3.0)
    data = jnp.stack([theta, phi], axis=-1)
    chord = chord_distances(data)
    cos12 = pairwise_cos(data)
    off = ~jnp.eye(5, dtype=bool)
    assert jnp.allclose(
        (chord**2)[..., off], (2 - 2 * cos12)[..., off], atol=1e-5
    )
    assert jnp.allclose(jnp.diagonal(chord, axis1=-2, axis2=-1), 0.0)

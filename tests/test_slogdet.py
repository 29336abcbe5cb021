"""Equivalence tests for the TPU-safe complex slogdet against jnp.linalg.slogdet."""

import jax
import jax.numpy as jnp
import pytest

from deephall_tpu.ops import slogdet as sd


def random_complex(key, shape):
    k1, k2 = jax.random.split(key)
    return jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)


@pytest.mark.parametrize("n", [1, 2, 3, 6, 9])
def test_matches_lapack_complex(n):
    a = random_complex(jax.random.PRNGKey(n), (7, n, n))
    sign_ref, logdet_ref = jnp.linalg.slogdet(a)
    sign, logdet = sd.slogdet(a)
    assert jnp.allclose(logdet, logdet_ref, atol=1e-4)
    assert jnp.allclose(sign, sign_ref, atol=1e-4)


def test_matches_lapack_real():
    a = jax.random.normal(jax.random.PRNGKey(0), (5, 4, 4))
    sign_ref, logdet_ref = jnp.linalg.slogdet(a)
    sign, logdet = sd.slogdet(a)
    assert jnp.allclose(logdet, logdet_ref, atol=1e-5)
    assert jnp.allclose(sign, sign_ref, atol=1e-5)


def test_gradients_match():
    """First and second derivatives through logdet agree with the LAPACK path."""
    n = 4
    a0 = random_complex(jax.random.PRNGKey(3), (n, n))

    def logpsi_custom(x):
        s, ld = sd.slogdet(a0 + x * jnp.eye(n))
        return (ld + jnp.log(s)).real

    def logpsi_ref(x):
        s, ld = jnp.linalg.slogdet(a0 + x * jnp.eye(n))
        return (ld + jnp.log(s)).real

    g_c = jax.grad(logpsi_custom)(0.5)
    g_r = jax.grad(logpsi_ref)(0.5)
    assert jnp.allclose(g_c, g_r, atol=1e-4)
    h_c = jax.hessian(logpsi_custom)(0.5)
    h_r = jax.hessian(logpsi_ref)(0.5)
    assert jnp.allclose(h_c, h_r, atol=1e-3)


def test_slogdet_solve_fused():
    """One-elimination (sign, logdet, A^-1 B) matches the separate computations."""
    a = random_complex(jax.random.PRNGKey(6), (4, 2, 5, 5))
    b = random_complex(jax.random.PRNGKey(7), (4, 2, 5, 9))
    sign, logdet, x = sd.slogdet_solve(a, b)
    sign_ref, logdet_ref = jnp.linalg.slogdet(a)
    assert jnp.allclose(sign, sign_ref, atol=1e-4)
    assert jnp.allclose(logdet, logdet_ref, atol=1e-4)
    assert jnp.allclose(a @ x, b, atol=1e-3)

    ar = jax.random.normal(jax.random.PRNGKey(8), (3, 4, 4))
    br = jax.random.normal(jax.random.PRNGKey(9), (3, 4, 2))
    sign2, logdet2, x2 = sd.slogdet_solve(ar, br)
    sr_ref, lr_ref = jnp.linalg.slogdet(ar)
    assert jnp.allclose(sign2, sr_ref, atol=1e-5)
    assert jnp.allclose(logdet2, lr_ref, atol=1e-4)
    assert jnp.allclose(ar @ x2, br, atol=1e-4)


def test_batched_solve_matches():
    """Batched-native solve agrees with jnp.linalg.solve (complex + real, vector)."""
    a = random_complex(jax.random.PRNGKey(10), (6, 3, 3))
    b = random_complex(jax.random.PRNGKey(11), (6, 3))
    ref = jnp.linalg.solve(a, b[..., None])[..., 0]
    assert jnp.allclose(sd.solve(a, b), ref, atol=1e-4)


def test_signed_logsumdet_multi():
    a = random_complex(jax.random.PRNGKey(4), (3, 5, 5))
    dets = jnp.exp(jnp.linalg.slogdet(a)[1]) * jnp.linalg.slogdet(a)[0]
    expected = jnp.log(jnp.sum(dets))
    got = sd.signed_logsumdet(a)
    assert jnp.allclose(got, expected, atol=1e-4)

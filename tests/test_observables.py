"""Observable-estimator tests with exact physics oracles.

The Laughlin state's overlap with itself is exactly 1; the one-body RDM of any
N-electron state has trace N; histograms have known mass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephall_tpu.config import Config
from deephall_tpu.networks import make_network
from deephall_tpu.observables import evaluate_observable
from deephall_tpu.observables.harmonics import make_monopole_harm


@pytest.fixture(scope="module")
def laughlin_run():
    cfg = Config()
    cfg.seed = 7
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 6
    cfg.network.type = "laughlin"
    cfg.batch_size = 64
    model = make_network(cfg.system, cfg.network)
    nelec = sum(cfg.system.nspins)
    key1, key2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    theta = jnp.arccos(
        jax.random.uniform(key1, (cfg.batch_size, nelec), minval=-1, maxval=1)
    )
    phi = jax.random.uniform(
        key2, (cfg.batch_size, nelec), minval=-jnp.pi, maxval=jnp.pi
    )
    data = jnp.stack([theta, phi], axis=-1)
    params = {}
    # Burn in a little so walkers sample |psi|^2 before estimating.
    return cfg, model, params, data, jnp.asarray(0.3)


def test_overlap_identity(laughlin_run):
    cfg, model, params, data, width = laughlin_run
    results = evaluate_observable(
        cfg, model, params, data, width, "overlap", steps=3
    )
    assert np.allclose(results["overlap"], 1.0, atol=1e-4)


def test_one_rdm_trace(laughlin_run):
    cfg, model, params, data, width = laughlin_run
    results = evaluate_observable(
        cfg, model, params, data, width, "one_rdm", steps=30
    )
    nelec = sum(cfg.system.nspins)
    # MC estimate of the trace converges to N; loose tolerance for few steps.
    assert abs(results["trace"].real - nelec) < 0.5
    assert results["one_rdm"].shape == (cfg.system.flux + 1, cfg.system.flux + 1)


def test_density_mass(laughlin_run):
    cfg, model, params, data, width = laughlin_run
    steps = 4
    results = evaluate_observable(
        cfg, model, params, data, width, "density", steps=steps
    )
    nelec = sum(cfg.system.nspins)
    assert results["map"].sum() == pytest.approx(steps * cfg.batch_size * nelec)


def test_pair_corr_runs(laughlin_run):
    cfg, model, params, data, width = laughlin_run
    results = evaluate_observable(
        cfg, model, params, data, width, "pair_corr", steps=3
    )
    assert results["pair_corr"].shape == (200,)
    assert np.all(np.isfinite(results["pair_corr"]))
    # Correlation hole: electrons at nu=1/3 avoid each other at short range.
    assert results["pair_corr"][:5].sum() < results["pair_corr"][100:105].sum()


def test_monopole_harmonics_orthonormal():
    """Y_{Q,Q,m} are orthonormal on the sphere: MC check of <Y_m|Y_m'> = delta."""
    Q = 1.0
    key1, key2 = jax.random.split(jax.random.PRNGKey(0))
    n = 200_000
    theta = jnp.arccos(jax.random.uniform(key1, (n,), minval=-1, maxval=1))
    phi = jax.random.uniform(key2, (n,), minval=-jnp.pi, maxval=jnp.pi)
    pts = jnp.stack([theta, phi], axis=-1)
    ys = jnp.stack(
        [make_monopole_harm(Q, Q, m)(pts) for m in (-1.0, 0.0, 1.0)], axis=-1
    )
    gram = 4 * jnp.pi * jnp.einsum("ni,nj->ij", jnp.conj(ys), ys) / n
    assert jnp.allclose(jnp.abs(gram), jnp.eye(3), atol=0.05)

"""ED eigenstates as first-quantized wavefunctions: exact identities.

The evaluator (``networks/edstate.py``) turns an exact-diagonalization
eigenvector into a ``log psi`` callable.  Because the state is exact, these are
machine-precision identities, not statistical checks:

* pointwise kinetic local value ``N/2`` (LLL states are kinetic eigenstates),
* pointwise ``L^2`` local value at the exact multiplet eigenvalue,
* at N=3, 2Q=6 the L=0 state of the Lz=0 block is unique, so the ED ground
  state must *be* the analytic Laughlin state: the log-wavefunction difference
  is a constant (independent cross-validation of the ED pipeline, the
  first-quantized construction, and ``networks/laughlin.py`` all at once),
* the |psi|^2-mean of the local energy equals the ED eigenvalue (statistical),
* the ed_overlap estimator returns 1 for the ED state against itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephall_tpu.config import Config, Network, System
from deephall_tpu.hamiltonian import local_energy
from deephall_tpu.networks import make_network
from deephall_tpu.networks.edstate import make_ed_logpsi, make_ed_network
from deephall_tpu.observables import ed


def _random_configs(key, batch, nelec):
    k1, k2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(k1, (batch, nelec), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (batch, nelec), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


@pytest.fixture(scope="module")
def laughlin_block():
    system = System(flux=6, nspins=(3, 0))
    network, result = make_ed_network(system)
    return system, network, result


def test_ed_ground_is_laughlin_at_n3(laughlin_block):
    """N=3, 2Q=6: unique L=0 state => ED ground == Laughlin, to rounding."""
    system, network, result = laughlin_block
    assert abs(result.ground_l2) < 1e-8
    data = _random_configs(jax.random.PRNGKey(0), 12, 3)
    laughlin = make_network(system, dataclasses.replace(Network(), type="laughlin"))
    diff = network(None, data) - laughlin.apply({}, data)
    # Proportional states: the log difference is one complex constant.
    assert float(jnp.ptp(diff.real)) < 1e-5
    phase = jnp.exp(1j * (diff.imag - diff.imag[0]))
    np.testing.assert_allclose(phase, 1.0 + 0j, atol=1e-5)


def test_pointwise_kinetic_and_l2(laughlin_block):
    system, network, result = laughlin_block
    data = _random_configs(jax.random.PRNGKey(1), 8, 3)
    el, obs = jax.vmap(local_energy(network, system), in_axes=(None, 0))(None, data)
    np.testing.assert_allclose(obs["kinetic"], 1.5, atol=1e-4)
    np.testing.assert_allclose(obs["angular_momentum_square"], 0.0, atol=1e-4)
    np.testing.assert_allclose(obs["angular_momentum_z"], 0.0, atol=1e-4)
    # Pointwise el = N/2 + V(x) fluctuates; it must still be real.
    np.testing.assert_allclose(el.imag, 0.0, atol=1e-4)


def test_excited_eigenstate_l2_pointwise():
    """State index 1 of the N=3, 2Q=6 block: exact multiplet L^2 pointwise."""
    res = ed.ed_block(3, 6, two_lz=0)
    assert res.states is not None
    v1 = res.states[:, 1]
    l2_exact = float(v1 @ ed._apply_total_l2(6, res.basis, v1))
    logpsi = make_ed_logpsi(res, 6, state=1)
    system = System(flux=6, nspins=(3, 0))
    data = _random_configs(jax.random.PRNGKey(2), 6, 3)
    _, obs = jax.vmap(local_energy(lambda p, d: logpsi(d), system), in_axes=(None, 0))(
        None, data
    )
    np.testing.assert_allclose(obs["angular_momentum_square"], l2_exact, atol=1e-4)
    np.testing.assert_allclose(obs["kinetic"], 1.5, atol=1e-4)


def test_mean_local_energy_is_eigenvalue(laughlin_block):
    """MCMC mean of E_loc over |psi_ED|^2 equals N/2 + E0 (statistical)."""
    from deephall_tpu import mcmc

    system, network, result = laughlin_block
    step = jax.jit(
        mcmc.make_mcmc_step(jax.vmap(network, in_axes=(None, 0)), steps=10)
    )
    data = _random_configs(jax.random.PRNGKey(3), 512, 3)
    key = jax.random.PRNGKey(4)
    width = jnp.asarray(0.3)
    for _ in range(60):
        key, sub = jax.random.split(key)
        data, _ = step(None, data, sub, width)
    el, _ = jax.vmap(local_energy(network, system), in_axes=(None, 0))(None, data)
    expected = result.total_energy(3)
    assert abs(float(jnp.mean(el.real)) - expected) < 0.05, (
        float(jnp.mean(el.real)),
        expected,
    )


def test_structure_factor_estimator_matches_exact(laughlin_block):
    """Measured S_L on |psi_ED|^2 walkers == exact ED multipoles (statistical)."""
    from deephall_tpu import mcmc
    from deephall_tpu.observables.estimators import make_structure_factor

    system, network, result = laughlin_block
    cfg = Config()
    cfg.system = system
    est = make_structure_factor(cfg, network, lmax=4)

    step = jax.jit(
        mcmc.make_mcmc_step(jax.vmap(network, in_axes=(None, 0)), steps=10)
    )
    data = _random_configs(jax.random.PRNGKey(9), 512, 3)
    key = jax.random.PRNGKey(10)
    width = jnp.asarray(0.3)
    for _ in range(40):
        key, sub = jax.random.split(key)
        data, _ = step(None, data, sub, width)
    state = est.init(10)
    evaluate = jax.jit(est.evaluate)
    for _ in range(10):
        key, k_walk, k_eval = jax.random.split(key, 3)
        data, _ = step(None, data, k_walk, width)
        state = evaluate(None, k_eval, data, state)
    measured = est.digest(state, 10)["structure_factor"]
    exact = ed.structure_factor(result, 6, lmax=4)
    np.testing.assert_allclose(measured[0], 3.0, atol=1e-9)  # S_0 = N exactly
    np.testing.assert_allclose(measured, exact, atol=0.06)


def test_ed_overlap_estimator_self_is_one(laughlin_block):
    from deephall_tpu.observables.estimators import make_ed_overlap

    system, network, result = laughlin_block
    cfg = Config()
    cfg.system = system
    est = make_ed_overlap(cfg, network)
    data = _random_configs(jax.random.PRNGKey(5), 64, 3)
    state = est.init(1)
    state = est.evaluate(None, jax.random.PRNGKey(6), data, state)
    out = est.digest(state, 1)
    np.testing.assert_allclose(out["overlap"], 1.0, atol=1e-6)


def test_ed_overlap_is_sector_aware():
    """A checkpoint with lz_center=m validates against the Lz=m block's ground.

    The network under test *is* the exact ground of the two_lz=2 block; the
    estimator must target that same block when the config carries the sector
    penalty (overlap 1), and the Lz=0 block otherwise (overlap ~0 between
    different-Lz eigenstates).
    """
    from deephall_tpu.observables.estimators import make_ed_overlap

    system = System(flux=4, nspins=(3, 0))
    network, _ = make_ed_network(system, two_lz=2)
    data = _random_configs(jax.random.PRNGKey(7), 64, 3)

    def run(cfg_system):
        cfg = Config()
        cfg.system = cfg_system
        est = make_ed_overlap(cfg, network)
        state = est.evaluate(None, jax.random.PRNGKey(8), data, est.init(1))
        return float(est.digest(state, 1)["overlap"])

    sector_cfg = dataclasses.replace(system, lz_penalty=1.0, lz_center=1.0)
    np.testing.assert_allclose(run(sector_cfg), 1.0, atol=1e-6)
    assert run(system) < 0.2  # Lz=0 target: orthogonal multiplet members

"""Forward-Laplacian pipeline equivalence with the full-Hessian local energy.

The full-Hessian path is itself pinned by exact physics oracles
(``tests/test_hamiltonian.py``), so numerical agreement here transfers those
oracles to the jet pipeline.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from deephall_tpu.config import Network, NetworkType, OrbitalType, PsiformerNetwork, System
from deephall_tpu.hamiltonian import forward_laplacian_local_energy, local_energy
from deephall_tpu.loss import LossMode, make_loss_fn
from deephall_tpu.networks import make_network
from deephall_tpu.networks.fwdlap import psiformer_logpsi_jet


def random_walkers(key, batch, nelec):
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (batch, nelec), minval=0.3, maxval=np.pi - 0.3)
    phi = jax.random.uniform(k2, (batch, nelec), minval=-np.pi, maxval=np.pi)
    return jnp.stack([theta, phi], axis=-1)


CASES = [
    # (flux, nspins, orbital, ndets)
    (4, (3, 0), OrbitalType.full, 1),
    (4, (2, 1), OrbitalType.full, 2),
    (6, (3, 0), OrbitalType.sparse, 2),
]


@pytest.mark.parametrize("flux,nspins,orbital,ndets", CASES)
def test_jet_matches_full_hessian(flux, nspins, orbital, ndets):
    system = System(flux=flux, nspins=nspins)
    network = Network(
        type=NetworkType.psiformer,
        orbital=orbital,
        psiformer=PsiformerNetwork(num_heads=2, heads_dim=8, num_layers=2, determinants=ndets),
    )
    model = make_network(system, network)
    nelec = sum(nspins)
    data = random_walkers(jax.random.PRNGKey(1), 8, nelec)
    params = model.init(jax.random.PRNGKey(2), data[0])

    # The jet's primal channel must reproduce the forward exactly.
    out = psiformer_logpsi_jet(model, params, data)
    logpsi = model.apply(params, data)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(logpsi), rtol=1e-5, atol=1e-5)

    full = jax.vmap(local_energy(model.apply, system), in_axes=(None, 0))
    el_full, obs_full = jax.jit(full)(params, data)

    # Default system (compute_l2=True): the jet carries the three L^2 directions
    # and must reproduce the full-Hessian contraction, observable included.
    fast = forward_laplacian_local_energy(model, system)
    el_fast, obs_fast = jax.jit(fast)(params, data)
    np.testing.assert_allclose(np.asarray(el_fast), np.asarray(el_full), rtol=2e-3, atol=2e-3)
    for key in (
        "kinetic",
        "potential",
        "angular_momentum_z",
        "angular_momentum_z_square",
        "angular_momentum_square",
    ):
        np.testing.assert_allclose(
            np.asarray(obs_fast[key]),
            np.asarray(obs_full[key]),
            rtol=2e-3,
            atol=2e-3,
            err_msg=key,
        )

    # With the L^2 observable off, the lean jet (one extra direction) reports NaN
    # for L^2 and agrees on everything else.
    lean_system = System(flux=flux, nspins=nspins, compute_l2=False)
    lean = forward_laplacian_local_energy(model, lean_system)
    el_lean, obs_lean = jax.jit(lean)(params, data)
    np.testing.assert_allclose(np.asarray(el_lean), np.asarray(el_full), rtol=2e-3, atol=2e-3)
    assert np.all(np.isnan(np.asarray(obs_lean["angular_momentum_square"])))


def test_loss_dispatch_uses_fast_path():
    system = System(flux=4, nspins=(3, 0), compute_l2=False)
    network = Network(
        psiformer=PsiformerNetwork(num_heads=2, heads_dim=8, num_layers=1)
    )
    model = make_network(system, network)
    data = random_walkers(jax.random.PRNGKey(3), 16, 3)
    params = model.init(jax.random.PRNGKey(4), data[0])

    stats_fast, grads_fast = jax.jit(
        make_loss_fn(model.apply, system, LossMode.ENERGY_GRAD, model=model)
    )(params, data)
    assert np.isnan(float(stats_fast["angular_momentum_square"]))

    system_full = System(flux=4, nspins=(3, 0), compute_l2=True)
    stats_full, grads_full = jax.jit(
        make_loss_fn(model.apply, system_full, LossMode.ENERGY_GRAD, model=model)
    )(params, data)
    np.testing.assert_allclose(
        complex(stats_fast["energy"]), complex(stats_full["energy"]), rtol=1e-4
    )
    flat_fast = jax.tree_util.tree_leaves(grads_fast)
    flat_full = jax.tree_util.tree_leaves(grads_full)
    for a, b in zip(flat_fast, flat_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_bm_jet_matches_vpu_jet(monkeypatch):
    """The batch-minor jet attention is a pure relayout: all four jet channels
    must match the channel-leading ("vpu") lowering to float tolerance."""
    import deephall_tpu.networks.fwdlap as nf

    system = System(flux=4, nspins=(2, 1))
    network = Network(
        type=NetworkType.psiformer,
        psiformer=PsiformerNetwork(num_heads=2, heads_dim=8, num_layers=2, determinants=2),
    )
    model = make_network(system, network)
    data = random_walkers(jax.random.PRNGKey(5), 8, 3)
    params = model.init(jax.random.PRNGKey(6), data[0])

    monkeypatch.setattr(nf, "JET_ATTENTION_IMPL", "vpu")
    ref = jax.jit(lambda p, d: psiformer_logpsi_jet(model, p, d, compute_l2=True))(
        params, data
    )
    monkeypatch.setattr(nf, "JET_ATTENTION_IMPL", "bm")
    bm = jax.jit(lambda p, d: psiformer_logpsi_jet(model, p, d, compute_l2=True))(
        params, data
    )
    for name, a, b in zip("xjld", ref, bm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


@pytest.mark.parametrize("tower_impl", ["fullbm", "tb"])
@pytest.mark.parametrize("flux,nspins,orbital,ndets", CASES)
def test_fullbm_tower_matches_std(flux, nspins, orbital, ndets, tower_impl, monkeypatch):
    """fullbm and tb towers are pure relayouts of the standard jet tower."""
    import deephall_tpu.networks.fwdlap as nf

    system = System(flux=flux, nspins=nspins)
    network = Network(
        type=NetworkType.psiformer,
        orbital=orbital,
        psiformer=PsiformerNetwork(num_heads=2, heads_dim=8, num_layers=2, determinants=ndets),
    )
    model = make_network(system, network)
    data = random_walkers(jax.random.PRNGKey(7), 8, sum(nspins))
    params = model.init(jax.random.PRNGKey(8), data[0])

    monkeypatch.setattr(nf, "JET_TOWER_IMPL", "std")
    ref = jax.jit(lambda p, d: psiformer_logpsi_jet(model, p, d, compute_l2=True))(
        params, data
    )
    monkeypatch.setattr(nf, "JET_TOWER_IMPL", tower_impl)
    bm = jax.jit(lambda p, d: psiformer_logpsi_jet(model, p, d, compute_l2=True))(
        params, data
    )
    # 1e-4: the relayout changes f32 reduction order through ~500 chained ops.
    for name, a, b in zip("xjld", ref, bm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )

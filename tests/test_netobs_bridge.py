"""Exercise the netobs plugin surface against a stubbed ``netobs`` package.

The external ``netobs`` analysis CLI is an optional dependency that is not
installed in CI; these tests install a minimal in-memory stub of the netobs API
(adaptor base class, estimator/observable bases, the electron-gas system type)
and then drive the real plugin code end to end: ``DeepHallAdaptor.restore`` from
a saved checkpoint + ``config.yml``, the walking step, the kinetic-energy hook
against an exact LLL oracle, and the overlap / 1-RDM estimators against their
physics identities.  The estimators must also return **per-walker** value arrays
(the reference's netobs contract, which netobs's across-step error bars rely on).
"""

from __future__ import annotations

import sys
import types
from typing import Any, Generic, TypedDict, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
import pytest

S = TypeVar("S")


def _install_netobs_stub():
    """Build fake netobs modules exposing just the API the bridge uses."""

    class ElectronGas(TypedDict):
        spins: list[int]
        ndim: int

    class NetworkAdaptor(Generic[S]):
        def __init__(self, config: Any, args: list[str]):
            self.config = config
            self.args = args

        def call_network(self, params, electrons, system):
            return self.call_signed_network(params, electrons, system)[1]

        def tree_flatten(self):
            return (), self

        @classmethod
        def tree_unflatten(cls, aux_data, children):
            del children
            return aux_data

    class Observable(Generic[S]):
        def __init__(self, system=None, options=None):
            self.system = system
            self.options = options or {}

        def shapeof(self, system) -> tuple[int, ...]:
            del system
            return ()

        @property
        def shape(self) -> tuple[int, ...]:
            return self.shapeof(self.system)

    class Estimator(Generic[S]):
        observable_type = Observable

        def __init__(self, adaptor, system, estimator_options, observable_options):
            self.adaptor = adaptor
            self.system = system
            self.options = estimator_options or {}
            self.observable = self.observable_type(system, observable_options)

    class Density(Observable):
        pass

    mods = {}
    netobs = mods["netobs"] = types.ModuleType("netobs")
    adaptors = mods["netobs.adaptors"] = types.ModuleType("netobs.adaptors")
    adaptors.NetworkAdaptor = NetworkAdaptor
    adaptors.WalkingStep = Any
    observables = mods["netobs.observables"] = types.ModuleType("netobs.observables")
    observables.Estimator = Estimator
    observables.Observable = Observable
    density_mod = mods["netobs.observables.density"] = types.ModuleType(
        "netobs.observables.density"
    )
    density_mod.Density = Density
    systems = mods["netobs.systems"] = types.ModuleType("netobs.systems")
    elec_gas = mods["netobs.systems.elec_gas"] = types.ModuleType(
        "netobs.systems.elec_gas"
    )
    elec_gas.ElectronGas = ElectronGas
    netobs.adaptors = adaptors
    netobs.observables = observables
    netobs.systems = systems
    return mods


@pytest.fixture(scope="module")
def bridge(tmp_path_factory):
    """Stub netobs, save a tiny analytic-Laughlin run, restore it via the plugin."""
    mods = _install_netobs_stub()
    saved = {name: sys.modules.get(name) for name in mods}
    sys.modules.update(mods)
    for name in list(sys.modules):
        if name.startswith("deephall_tpu.netobs_bridge"):
            del sys.modules[name]
    try:
        from deephall_tpu.config import Config
        from deephall_tpu.log import CheckpointState, LogManager
        from deephall_tpu.netobs_bridge.adaptor import DeepHallAdaptor
        from deephall_tpu.train import init_guess

        run_dir = tmp_path_factory.mktemp("laughlin_run")
        cfg = Config()
        cfg.seed = 11
        cfg.batch_size = 64
        cfg.system.nspins = (3, 0)
        cfg.system.flux = 6
        cfg.network.type = "laughlin"
        cfg.log.save_path = str(run_dir)
        manager = LogManager(cfg)  # writes the config.yml sidecar
        data = init_guess(jax.random.PRNGKey(0), cfg.batch_size, 3)
        manager.save_checkpoint(
            41, CheckpointState({}, np.asarray(data), None, np.float32(0.3))
        )

        adaptor = DeepHallAdaptor(config=None, args=[])
        params, walkers, system, aux = adaptor.restore(
            str(run_dir / "ckpt_000041.npz")
        )

        # Equilibrate: a few Metropolis sweeps so walkers sample |psi|^2.
        batch_log_psi = jax.vmap(adaptor.call_network, in_axes=(None, 0, None))
        walk = adaptor.make_walking_step(batch_log_psi, steps=10, system=system)
        key = jax.random.PRNGKey(5)
        for _ in range(10):
            key, subkey = jax.random.split(key)
            walkers, aux = walk(subkey, params, walkers, aux)
        yield adaptor, params, walkers, system, aux
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
        for name in list(sys.modules):
            if name.startswith("deephall_tpu.netobs_bridge"):
                del sys.modules[name]


def test_restore_surface(bridge):
    adaptor, params, walkers, system, aux = bridge
    assert system["flux"] == 6
    assert system["spins"] == [3, 0]
    assert walkers.shape == (64, 3, 2)
    assert float(aux["mcmc_width"]) == pytest.approx(0.3)
    sign, logpsi = adaptor.call_signed_network(params, walkers[0], system)
    assert float(sign) == 1.0
    assert jnp.iscomplexobj(logpsi)


def test_kinetic_energy_hook_lll_oracle(bridge):
    """The Laughlin state lives in the LLL: every walker has KE = nelec / 2."""
    adaptor, params, walkers, system, aux = bridge
    ke = jax.vmap(
        lambda e: adaptor.call_local_kinetic_energy(params, None, e, system)
    )(walkers[:8])
    np.testing.assert_allclose(np.asarray(ke.real), 1.5, atol=1e-3)
    pe = adaptor.call_local_potential_energy(params, None, walkers[0], system)
    assert float(pe) > 0  # Coulomb repulsion


def test_overlap_estimator_self_overlap(bridge):
    """Overlap of the Laughlin run with the analytic Laughlin state is exactly 1."""
    adaptor, params, walkers, system, aux = bridge
    from deephall_tpu.netobs_bridge.observables.overlap import OverlapEstimator

    est = OverlapEstimator(adaptor, system, {}, {})
    steps = 3
    values, state = est.empty_val_state(steps)
    for i in range(steps):
        step_values, state = est.evaluate(
            i, params, jax.random.PRNGKey(i), walkers, system, state, None
        )
        # Per-walker contract: one ratio per walker, not a pre-reduced scalar.
        assert step_values["ratio"].shape == (64,)
        assert step_values["ratio_square"].shape == (64,)
        values = {
            k: v.at[i].set(jnp.nanmean(step_values[k])) for k, v in values.items()
        }
    result = est.digest(values, state)
    assert float(result["overlap"]) == pytest.approx(1.0, abs=1e-4)


def test_one_rdm_estimator_trace(bridge):
    """MC trace of the 1-RDM converges to the electron number."""
    adaptor, params, walkers, system, aux = bridge
    from deephall_tpu.netobs_bridge.observables.one_rdm import OneRDMEstimator

    est = OneRDMEstimator(adaptor, system, {}, {})
    steps = 20
    values, state = est.empty_val_state(steps)
    assert values["one_rdm"].shape == (steps, 7, 7)
    key = jax.random.PRNGKey(9)
    batch_log_psi = jax.vmap(adaptor.call_network, in_axes=(None, 0, None))
    walk = adaptor.make_walking_step(batch_log_psi, steps=5, system=system)
    mean_rdms = []
    for i in range(steps):
        key, k_walk, k_eval = jax.random.split(key, 3)
        walkers, aux = walk(k_walk, params, walkers, aux)
        step_values, state = est.evaluate(
            i, params, k_eval, walkers, system, state, aux
        )
        # Per-walker contract: [batch, norb, norb] products per step.
        assert step_values["one_rdm"].shape == (64, 7, 7)
        mean_rdms.append(jnp.mean(step_values["one_rdm"], axis=0))
        values["one_rdm"] = values["one_rdm"].at[i].set(mean_rdms[-1])
    result = est.digest(values, state)
    assert abs(complex(result["trace"]).real - 3.0) < 0.5


def test_density_and_pair_corr_shims(bridge):
    adaptor, params, walkers, system, aux = bridge
    from deephall_tpu.netobs_bridge.observables.density import DensityEstimator
    from deephall_tpu.netobs_bridge.observables.pair_corr import (
        PairCorrelationEstimator,
    )

    dens = DensityEstimator(adaptor, system, {"bins": 25}, {})
    _, dstate = dens.empty_val_state(2)
    for i in range(2):
        _, dstate = dens.evaluate(i, params, None, walkers, system, dstate, aux)
    assert float(dstate["map"].sum()) == pytest.approx(2 * 64 * 3)

    pair = PairCorrelationEstimator(adaptor, system, {}, {})
    _, pstate = pair.empty_val_state(2)
    for i in range(2):
        _, pstate = pair.evaluate(i, params, None, walkers, system, pstate, aux)
    assert np.all(np.isfinite(np.asarray(pstate["pair_corr"])))
    # nu=1/3 correlation hole at short range.
    assert pstate["pair_corr"][:5].sum() < pstate["pair_corr"][100:105].sum()

"""Feature-coverage tests: penalties, multi-determinant, two spin sectors,
harmonic interaction, radius override, quasihole/quasiparticle Laughlin states."""

import jax
import jax.numpy as jnp
import pytest

from deephall_tpu.config import InteractionType, Network, System
from deephall_tpu.hamiltonian import local_energy
from deephall_tpu.loss import LossMode, make_loss_fn
from deephall_tpu.networks import make_network
from deephall_tpu.networks.laughlin import Laughlin
from deephall_tpu.train import init_guess


def _psiformer(system, **kwargs):
    net = Network()
    net.psiformer.num_layers = 1
    net.psiformer.num_heads = 1
    net.psiformer.heads_dim = 4
    for k, v in kwargs.items():
        setattr(net.psiformer, k, v)
    return make_network(system, net)


def test_lz_l2_penalties_produce_finite_grads():
    system = System(
        flux=2, nspins=(3, 0), interaction_strength=0.0,
        lz_penalty=0.5, lz_center=1.0, l2_penalty=0.3,
    )
    model = _psiformer(system)
    data = init_guess(jax.random.PRNGKey(0), 8, 3)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
    loss_fn = make_loss_fn(model.apply, system, LossMode.ENERGY_GRAD)
    stats, grads = jax.jit(loss_fn)(params, data)
    assert jnp.isfinite(stats["energy"].real)
    for leaf in jax.tree.leaves(grads):
        assert jnp.all(jnp.isfinite(leaf))


def test_multi_determinant():
    system = System(flux=2, nspins=(3, 0))
    model = _psiformer(system, determinants=4)
    data = init_guess(jax.random.PRNGKey(0), 4, 3)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))
    # orbital head produces ndet determinants
    kernel = params["params"]["Orbitals_0"]["featured_orbitals"]["DenseGeneral_0"][
        "kernel"
    ]
    assert kernel.shape[-1] == 4


def test_two_spin_sectors():
    system = System(flux=4, nspins=(2, 1))
    model = _psiformer(system)
    data = init_guess(jax.random.PRNGKey(0), 4, 3)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))
    # both spin sectors and both Jastrow channels materialise
    fo = params["params"]["Orbitals_0"]["featured_orbitals"]
    assert set(fo) == {
        "DenseGeneral_0", "DenseGeneral_1", "DenseGeneral_2", "DenseGeneral_3"
    }
    assert set(params["params"]["Jastrow_0"]) == {"ee_par", "ee_anti"}
    el = jax.vmap(
        local_energy(model.apply, system), in_axes=(None, 0)
    )(params, data)
    assert jnp.all(jnp.isfinite(el[0].real))


def test_harmonic_interaction_and_radius():
    system = System(
        flux=2, nspins=(3, 0), interaction_type=InteractionType.harmonic, radius=2.5
    )
    model = _psiformer(system)
    data = init_guess(jax.random.PRNGKey(0), 4, 3)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
    el, obs = jax.vmap(local_energy(model.apply, system), in_axes=(None, 0))(
        params, data
    )
    assert jnp.all(jnp.isfinite(el.real))


def test_laughlin_quasihole():
    # N=2Q1 -> quasihole branch: flux=8, p=1, N=3 => Q1 = 4 - 2 = 2, 2*Q1=4 != 3.
    # Choose flux so that nelec == 2*Q1: N=4, Q1=2 -> flux/2 - 3 = 2 -> flux=10.
    model = Laughlin(nspins=(4, 0), flux=10, excitation_lz=0)
    data = init_guess(jax.random.PRNGKey(0), 3, 4)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))


def test_laughlin_quasiparticle():
    # nelec == 2*Q1 + 2: N=4, Q1=1 -> flux/2 - 3 = 1 -> flux=8.
    model = Laughlin(nspins=(4, 0), flux=8, excitation_lz=0)
    data = init_guess(jax.random.PRNGKey(0), 3, 4)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))


@pytest.mark.parametrize("nelec,flux", [(4, 6), (8, 16)])
def test_jain_two_level_oracles(nelec, flux):
    """Jain nu=2/5 state (N = 4*Q1 + 4): exact identities KE = N/2, L^2 = 0.

    The filled-two-Lambda-level state is rotationally invariant and, after the
    quasiparticle-style LLL projection, lives entirely in the lowest Landau
    level — both properties are exact, parameter-free quantum-mechanical
    oracles (same class as the reference's LLL determinant tests,
    ``/root/reference/tests/hamiltonian_test.py:65-76``).
    """
    from deephall_tpu.hamiltonian import make_local_kinetic_energy

    model = Laughlin(nspins=(nelec, 0), flux=flux)
    data = init_guess(jax.random.PRNGKey(0), 3, nelec)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))

    Q = flux / 2
    ke_fn = make_local_kinetic_energy(model.apply, Q, jnp.sqrt(Q))
    ke, obs = jax.jit(jax.vmap(ke_fn, in_axes=(None, 0)))(params, data)
    assert jnp.allclose(ke, nelec / 2, atol=1e-3)
    assert jnp.allclose(obs["angular_momentum_square"], 0, atol=1e-3)


class _GeneralJain(Laughlin):
    """Laughlin with the Jain dispatch forced to the general Lambda-level path."""

    n_levels_override: int = 2

    def setup(self):
        nelec = sum(self.nspins)
        self.Q1 = self.flux / 2 - self.cf_flux * (nelec - 1)
        self.n_levels = self.n_levels_override
        self.cf_orbitals = self.jain_orbitals


@pytest.mark.parametrize("nelec,flux", [(4, 6), (8, 16)])
def test_general_jain_matches_hand_derived_two_level(nelec, flux):
    """The lowering-operator construction reproduces the hand-derived nu=2/5 state.

    Each determinant column may carry a different normalization constant, so
    log psi of the two constructions differs by a configuration-independent
    complex constant — variance of the difference over a batch must vanish.
    """
    hand = Laughlin(nspins=(nelec, 0), flux=flux)
    general = _GeneralJain(nspins=(nelec, 0), flux=flux)
    data = init_guess(jax.random.PRNGKey(0), 6, nelec)
    p_hand = hand.init(jax.random.PRNGKey(1), data[0])
    p_gen = general.init(jax.random.PRNGKey(1), data[0])
    lh = jax.vmap(lambda x: hand.apply(p_hand, x))(data)
    lg = jax.vmap(lambda x: general.apply(p_gen, x))(data)
    diff = lg - lh
    assert jnp.allclose(diff.real, diff.real[0], atol=1e-4)
    # imaginary parts are phases: compare mod 2*pi via the complex exponential
    assert jnp.allclose(jnp.exp(1j * (diff.imag - diff.imag[0])), 1.0, atol=1e-4)


def test_jain_three_level_oracles():
    """Jain nu=3/7 (N = 6*Q1 + 9, three filled Lambda levels): KE = N/2, L^2 = 0.

    Same exact-identity class as the two-level test above: a filled-shell CF
    state is rotationally invariant, and the Jain-Kamilla projection leaves it
    entirely in the lowest Landau level. N=12 at 2Q=23 (Q1 = 1/2) is the
    smallest three-level system.
    """
    from deephall_tpu.hamiltonian import make_local_kinetic_energy

    nelec, flux = 12, 23
    model = Laughlin(nspins=(nelec, 0), flux=flux)
    data = init_guess(jax.random.PRNGKey(0), 2, nelec)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))

    Q = flux / 2
    ke_fn = make_local_kinetic_energy(model.apply, Q, jnp.sqrt(Q))
    ke, obs = jax.jit(jax.vmap(ke_fn, in_axes=(None, 0)))(params, data)
    assert jnp.allclose(ke, nelec / 2, atol=1e-3)
    assert jnp.allclose(obs["angular_momentum_square"], 0, atol=1e-3)


def test_interaction_strength_scales_potential():
    base = System(flux=2, nspins=(3, 0), interaction_strength=1.0)
    double = System(flux=2, nspins=(3, 0), interaction_strength=2.0)
    model = _psiformer(base)
    data = init_guess(jax.random.PRNGKey(0), 2, 3)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
    _, obs1 = jax.vmap(local_energy(model.apply, base), in_axes=(None, 0))(params, data)
    _, obs2 = jax.vmap(local_energy(model.apply, double), in_axes=(None, 0))(
        params, data
    )
    assert jnp.allclose(obs2["potential"], 2 * obs1["potential"], atol=1e-5)

"""KFAC unit tests: layer discovery, factor properties, preconditioning sanity."""

import jax
import jax.numpy as jnp

from deephall_tpu.config import Config
from deephall_tpu.loss import LossMode, make_loss_fn
from deephall_tpu.networks import make_network
from deephall_tpu.optimizers.kfac import make_kfac_training_step
from deephall_tpu.train import init_guess
from deephall_tpu.types import CheckpointState


def _setup():
    cfg = Config()
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 2
    cfg.system.interaction_strength = 0.0
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 2
    cfg.network.psiformer.heads_dim = 4
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((3, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), 32, 3)
    loss_fn = make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_GRAD)
    init, step = make_kfac_training_step(cfg.optim.kfac, loss_fn, model, sample)
    return cfg, model, params, data, init, step


def test_init_discovers_all_dense_and_layernorm():
    cfg, model, params, data, init, step = _setup()
    opt_state = init(params, jax.random.PRNGKey(2), data)
    # 1 input dense + (qkv + out + post-attn dense + mlp dense) + 2 orbital denses
    kron_paths = set(opt_state.kron)
    assert any("query" in p for p in kron_paths)
    assert any("out" in p for p in kron_paths)
    assert any("Orbitals_0" in p for p in kron_paths)
    assert len(opt_state.diag) == 2  # two LayerNorms per layer block

    # factor shapes are square and match params
    for key, fac in opt_state.kron.items():
        assert fac["a"].shape[0] == fac["a"].shape[1]
        assert fac["g"].shape[0] == fac["g"].shape[1]


def test_one_step_updates_params_finitely():
    cfg, model, params, data, init, step = _setup()
    opt_state = init(params, jax.random.PRNGKey(2), data)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    new_state, stats = jax.jit(step)(state, jax.random.PRNGKey(3))
    changed = False
    for old, new in zip(jax.tree.leaves(params), jax.tree.leaves(new_state.params)):
        assert jnp.all(jnp.isfinite(new))
        if not jnp.allclose(old, new):
            changed = True
    assert changed
    assert jnp.isfinite(stats["energy"].real)
    # curvature factors became nonzero and PSD
    for fac in new_state.opt_state.kron.values():
        a = fac["a"]
        assert float(jnp.trace(a)) > 0
        eigs = jnp.linalg.eigvalsh(a)
        assert float(eigs.min()) > -1e-5
    assert int(new_state.opt_state.step) == 1


def test_energy_decreases_over_steps():
    cfg, model, params, data, init, step = _setup()
    opt_state = init(params, jax.random.PRNGKey(2), data)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    jstep = jax.jit(step)
    energies = []
    key = jax.random.PRNGKey(4)
    for _ in range(12):
        key, sub = jax.random.split(key)
        state, stats = jstep(state, sub)
        energies.append(float(stats["energy"].real))
    # Fixed walkers, pure optimization: energy must trend down toward 1.5.
    assert energies[-1] < energies[0]


def test_kfac_two_spin_sectors():
    """KFAC discovery and stepping with both spin sectors (4 orbital denses)."""
    cfg = Config()
    cfg.system.nspins = (2, 1)
    cfg.system.flux = 4
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((3, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), 16, 3)
    loss_fn = make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_GRAD)
    init, step = make_kfac_training_step(cfg.optim.kfac, loss_fn, model, sample)
    opt_state = init(params, jax.random.PRNGKey(2), data)
    orbital_kron = [p for p in opt_state.kron if "featured_orbitals" in p]
    assert len(orbital_kron) == 4  # real+imag denses per spin sector
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    new_state, stats = jax.jit(step)(state, jax.random.PRNGKey(3))
    assert jnp.isfinite(stats["energy"].real)
    for leaf in jax.tree.leaves(new_state.params):
        assert jnp.all(jnp.isfinite(leaf))


def test_kfac_sparse_orbitals_complex_taps():
    """Sparse orbitals route complex activations through the curvature capture."""
    from deephall_tpu.config import OrbitalType

    cfg = Config()
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 6
    cfg.network.orbital = OrbitalType.sparse
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((3, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), 16, 3)
    loss_fn = make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_GRAD)
    init, step = make_kfac_training_step(cfg.optim.kfac, loss_fn, model, sample)
    opt_state = init(params, jax.random.PRNGKey(2), data)
    assert any("lll_weight" in p for p in opt_state.kron)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    new_state, stats = jax.jit(step)(state, jax.random.PRNGKey(3))
    assert jnp.isfinite(stats["energy"].real)
    key = [p for p in new_state.opt_state.kron if "lll_weight" in p][0]
    assert float(jnp.trace(new_state.opt_state.kron[key]["a"])) > 0

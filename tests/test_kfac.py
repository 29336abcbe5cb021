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


def test_update_matches_dense_kronecker_pin():
    """One-Dense-layer toy: the step must equal an independent dense computation.

    For a single dense layer the Kronecker factorisation is exact, so the whole
    update — factors, pi-split damping, solves, quadratic norm, norm constraint,
    learning rate — can be recomputed from scratch in plain numpy from the
    kfac_jax equations (reference ``kfac.py:195-241``).  Pins the scale fidelity
    of the from-scratch implementation (hyperparameters were tuned for kfac_jax
    semantics, so magnitudes must transfer).
    """
    import numpy as np
    from flax import linen as nn

    from deephall_tpu.config import OptimizerKfac
    from deephall_tpu.networks import blocks

    din, dout, batch = 4, 3, 16

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return blocks.Dense(dout)(x).sum(axis=-1) + 0j

    model = Toy()
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, din))
    params = model.init(jax.random.PRNGKey(1), x[0])

    def loss_grad_fn(p, d):
        def loss(q):
            return jnp.sum(model.apply(q, d).real ** 2)

        return {"energy": jnp.zeros(())}, jax.grad(loss)(p)

    cfg = OptimizerKfac()  # production defaults: lr 0.05, damping 1e-3, c 1e-3
    init, step = make_kfac_training_step(cfg, loss_grad_fn, model, x[0])
    opt_state = init(params, jax.random.PRNGKey(2), x)
    state = CheckpointState(params, x, opt_state, jnp.asarray(0.1))
    new_state, _ = step(state, jax.random.PRNGKey(3))

    # ---- independent dense recomputation (numpy) ----
    w = np.asarray(params["params"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["Dense_0"]["bias"])
    xn = np.asarray(x)
    # gradient of sum((x W + b).sum(-1)^2)
    out = (xn @ w + b).sum(-1)
    gw = xn.T @ (2 * out[:, None] * np.ones((1, dout)))
    gb = (2 * out[:, None] * np.ones((1, dout))).sum(0)
    # factors: A from sown inputs (+bias column), G from sqrt(2)*ones cotangents
    a_ext = np.concatenate([xn, np.ones((batch, 1))], -1)
    a_fac = a_ext.T @ a_ext / batch
    g_fac = 2.0 * np.ones((dout, dout))
    # EMA with zero init: state/weight == fresh factors
    pi = np.sqrt((np.trace(a_fac) / (din + 1)) / (np.trace(g_fac) / dout))
    a_damped = a_fac + np.sqrt(cfg.damping) * pi * np.eye(din + 1)
    g_damped = g_fac + np.sqrt(cfg.damping) / pi * np.eye(dout)
    gmat = np.concatenate([gw, gb[None]], 0)
    delta = np.linalg.solve(a_damped, gmat)
    delta = np.linalg.solve(g_damped, delta.T).T
    quad = np.sum(delta * (a_damped @ delta @ g_damped))
    lr = cfg.lr.rate  # schedule at step 0
    coeff = min(1.0, np.sqrt(cfg.norm_constraint / (lr**2 * quad)))
    expect_w = w - lr * coeff * delta[:-1]
    expect_b = b - lr * coeff * delta[-1]

    got_w = np.asarray(new_state.params["params"]["Dense_0"]["kernel"])
    got_b = np.asarray(new_state.params["params"]["Dense_0"]["bias"])
    np.testing.assert_allclose(got_w, expect_w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got_b, expect_b, rtol=1e-4, atol=1e-6)

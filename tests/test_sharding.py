"""Mesh/sharding tests: results must be identical on 1 vs 8 devices.

The partitionable threefry RNG plus global-mean collectives make every computation in
the framework device-count invariant — a stronger property than the reference's
per-device key splitting, and the thing that makes checkpoints portable.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deephall_tpu import optimizers, parallel
from deephall_tpu.config import Config
from deephall_tpu.mcmc import make_mcmc_step
from deephall_tpu.networks import make_network
from deephall_tpu.train import init_guess
from deephall_tpu.types import CheckpointState
from deephall_tpu.utils import pack_complex


def _tiny_cfg():
    cfg = Config()
    cfg.seed = 3
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 2
    cfg.system.interaction_strength = 0.0
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    cfg.batch_size = 16
    cfg.mcmc.steps = 3
    return cfg


def _run_one_iteration(cfg, n_devices):
    mesh = parallel.get_mesh(jax.devices()[:n_devices])
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    rep_sharding = NamedSharding(mesh, P())

    nelec = sum(cfg.system.nspins)
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((nelec, 2))
    params = jax.device_put(
        jax.jit(model.init)(jax.random.PRNGKey(0), sample), rep_sharding
    )
    data = jax.device_put(
        init_guess(jax.random.PRNGKey(1), cfg.batch_size, nelec), data_sharding
    )
    width = jax.device_put(jnp.asarray(cfg.mcmc.width), rep_sharding)

    batch_network = jax.vmap(model.apply, in_axes=(None, 0))
    mcmc_step = jax.jit(make_mcmc_step(batch_network, steps=cfg.mcmc.steps))
    data, pmove = mcmc_step(params, data, jax.random.PRNGKey(2), width)

    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(3), data)
    state = CheckpointState(params, data, opt_state, width)

    def step_packed(state, key):
        new_state, stats = training_step(state, key)
        return new_state, pack_complex(stats)

    new_state, stats = jax.jit(step_packed)(state, jax.random.PRNGKey(4))
    return (
        float(pmove),
        jax.device_get(new_state.data),
        float(stats["energy"].real),
        jax.device_get(new_state.params),
    )


def test_device_count_invariance():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    p1, d1, e1, params1 = _run_one_iteration(_tiny_cfg(), 1)
    p8, d8, e8, params8 = _run_one_iteration(_tiny_cfg(), 8)
    assert abs(p1 - p8) < 1e-6
    assert jnp.allclose(d1, d8, atol=1e-6)
    assert abs(e1 - e8) < 1e-4
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        assert jnp.allclose(a, b, atol=1e-4)


def test_data_stays_sharded():
    cfg = _tiny_cfg()
    mesh = parallel.get_mesh(jax.devices()[:8])
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    nelec = sum(cfg.system.nspins)
    model = make_network(cfg.system, cfg.network)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((nelec, 2)))
    data = jax.device_put(
        init_guess(jax.random.PRNGKey(1), cfg.batch_size, nelec), data_sharding
    )
    batch_network = jax.vmap(model.apply, in_axes=(None, 0))
    mcmc_step = jax.jit(make_mcmc_step(batch_network, steps=2))
    new_data, _ = mcmc_step(params, data, jax.random.PRNGKey(2), jnp.asarray(0.1))
    assert new_data.sharding.is_equivalent_to(data_sharding, new_data.ndim)


def test_bf16_sweep_device_count_invariant(monkeypatch):
    """The reduced-precision sampler composes with the mesh: 1 vs 8 devices
    produce identical walkers (partitionable threefry + dtype casts shard)."""
    from deephall_tpu.train import make_sweep_network

    monkeypatch.setenv("DEEPHALL_MCMC_DTYPE", "bf16")
    cfg = _tiny_cfg()
    nelec = sum(cfg.system.nspins)
    model = make_network(cfg.system, cfg.network)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((nelec, 2)))

    results = {}
    for n_devices in (1, 8):
        mesh = parallel.get_mesh(jax.devices()[:n_devices])
        data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
        rep_sharding = NamedSharding(mesh, P())
        params_d = jax.device_put(params, rep_sharding)
        data = jax.device_put(
            init_guess(jax.random.PRNGKey(1), cfg.batch_size, nelec), data_sharding
        )
        width = jax.device_put(jnp.asarray(cfg.mcmc.width), rep_sharding)
        mcmc_step = jax.jit(
            make_mcmc_step(make_sweep_network(model.apply), steps=cfg.mcmc.steps)
        )
        new_data, pmove = mcmc_step(params_d, data, jax.random.PRNGKey(2), width)
        assert new_data.sharding.is_equivalent_to(data_sharding, new_data.ndim)
        results[n_devices] = (jax.device_get(new_data), float(pmove))

    assert jnp.array_equal(results[1][0], results[8][0])
    assert abs(results[1][1] - results[8][1]) < 1e-6

"""Fused iteration block tests: width adaptation equals the reference host logic,
block results are independent of block partitioning."""

import jax
import jax.numpy as jnp
import numpy as np

from deephall_tpu import mcmc, optimizers
from deephall_tpu.config import Config
from deephall_tpu.networks import make_network
from deephall_tpu.train import init_guess, make_iteration_block
from deephall_tpu.types import CheckpointState


def _setup(optimizer="none", adapt_frequency=3):
    cfg = Config()
    cfg.seed = 5
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 2
    cfg.system.interaction_strength = 0.0
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    cfg.batch_size = 16
    cfg.mcmc.steps = 2
    cfg.mcmc.adapt_frequency = adapt_frequency
    cfg.optim.optimizer = optimizer
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((3, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), cfg.batch_size, 3)
    mcmc_net = jax.vmap(model.apply, in_axes=(None, 0))
    mcmc_step_fn = mcmc.make_mcmc_step(mcmc_net, steps=cfg.mcmc.steps)
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(2), data)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    return cfg, mcmc_step_fn, training_step, state


def test_width_adaptation_matches_reference_logic():
    """The in-graph ring-buffer width update must reproduce update_mcmc_width."""
    cfg, mcmc_step_fn, training_step, state = _setup(adapt_frequency=3)
    block = make_iteration_block(cfg, mcmc_step_fn, training_step)
    pm = jnp.zeros(cfg.mcmc.adapt_frequency)
    t = jnp.zeros((), jnp.int32)
    key = jax.random.PRNGKey(7)

    # run 8 iterations on device, collecting pmoves and the final width
    widths = []
    pmove_hist = []
    st = state
    for _ in range(8):
        st, key, pm, t, (stats, pmove) = block(st, key, pm, t, 1)
        widths.append(float(st.mcmc_width))
        pmove_hist.append(float(pmove[0]))

    # replay the reference host-side logic on the recorded pmoves
    width = 0.1
    pmoves_host = np.zeros(cfg.mcmc.adapt_frequency)
    for step, p in enumerate(pmove_hist):
        width, pmoves_host = mcmc.update_mcmc_width(
            step, width, cfg.mcmc.adapt_frequency, jnp.asarray(p), pmoves_host
        )
        assert abs(float(width) - widths[step]) < 1e-6, step


def test_mcmc_sweep_batched_network_matches_vmapped():
    """The sweep driven by the natively-batched apply equals the vmapped one.

    ``DEEPHALL_MCMC_NETWORK=batched`` (train.py) swaps the sweep's network from
    ``vmap(model.apply)`` to the batched ``model.apply`` so the batch-minor
    attention lowering can trigger inside the sweep; the walker trajectory must
    not depend on which surface is used.
    """
    cfg, _, _, state = _setup()
    model = make_network(cfg.system, cfg.network)
    key = jax.random.PRNGKey(3)
    width = jnp.asarray(0.3)
    vmapped = mcmc.make_mcmc_step(jax.vmap(model.apply, in_axes=(None, 0)), steps=4)
    batched = mcmc.make_mcmc_step(model.apply, steps=4)
    data_v, pmove_v = jax.jit(vmapped)(state.params, state.data, key, width)
    data_b, pmove_b = jax.jit(batched)(state.params, state.data, key, width)
    assert np.allclose(np.asarray(data_v), np.asarray(data_b), atol=1e-5)
    assert abs(float(pmove_v) - float(pmove_b)) < 1e-6


def test_block_partitioning_invariance():
    """Running 6 iterations as 6x1, 2x3 or 1x6 blocks gives identical results."""
    outcomes = []
    for lengths in ([1] * 6, [3, 3], [6]):
        cfg, mcmc_step_fn, training_step, state = _setup(optimizer="adam")
        block = make_iteration_block(cfg, mcmc_step_fn, training_step)
        pm = jnp.zeros(cfg.mcmc.adapt_frequency)
        t = jnp.zeros((), jnp.int32)
        key = jax.random.PRNGKey(11)
        st = state
        energies = []
        for n in lengths:
            st, key, pm, t, (stats, pmove) = block(st, key, pm, t, n)
            energies.extend(np.asarray(stats["energy"].real).tolist())
        outcomes.append((energies, np.asarray(jax.device_get(st.data))))
    for energies, data in outcomes[1:]:
        assert np.allclose(energies, outcomes[0][0], atol=1e-5)
        assert np.allclose(data, outcomes[0][1], atol=1e-5)

"""Dynamic-penalty operands (``system.dynamic_penalties``).

The penalty scalars (``lz_center``, ``lz_penalty``, ``l2_penalty``,
``overlap_penalty``) can ride into the compiled training step as traced
operands instead of baked program constants, so penalty sweeps (the per-sector
magnetoroton runs, ``scripts/magnetoroton.py``) share ONE executable.  Pinned
here: (a) exact numerical equivalence with the static-penalty graph for every
optimizer, (b) one jit cache entry across different penalty values, and
(c) the fused block accepts and threads the operand dict.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deephall_tpu import mcmc, optimizers
from deephall_tpu.config import Config
from deephall_tpu.networks import make_network
from deephall_tpu.train import init_guess, make_iteration_block
from deephall_tpu.types import CheckpointState


def _setup(optimizer, *, lz_penalty, lz_center, l2_penalty, dynamic):
    cfg = Config()
    cfg.seed = 5
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 2
    cfg.system.interaction_strength = 0.0
    cfg.system.lz_penalty = lz_penalty
    cfg.system.lz_center = lz_center
    cfg.system.l2_penalty = l2_penalty
    cfg.system.dynamic_penalties = dynamic
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    cfg.batch_size = 16
    cfg.mcmc.steps = 2
    cfg.optim.optimizer = optimizer
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((3, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), cfg.batch_size, 3)
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(2), data)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))
    return cfg, model, training_step, state


def _operands(
    lz_penalty, lz_center, l2_penalty, overlap_penalty=1.0, l2_center=0.0
):
    return {
        "lz_penalty": jnp.asarray(lz_penalty, jnp.float32),
        "lz_center": jnp.asarray(lz_center, jnp.float32),
        "l2_penalty": jnp.asarray(l2_penalty, jnp.float32),
        "l2_center": jnp.asarray(l2_center, jnp.float32),
        "overlap_penalty": jnp.asarray(overlap_penalty, jnp.float32),
    }


def test_dynamic_equals_static_per_optimizer():
    """One step with dynamic penalty operands == the static-constant graph."""
    values = dict(lz_penalty=0.7, lz_center=1.0, l2_penalty=0.05)
    for optimizer in ("kfac", "adam", "none"):
        _, _, static_step, state_s = _setup(optimizer, dynamic=False, **values)
        _, _, dyn_step, state_d = _setup(optimizer, dynamic=True, **values)
        key = jax.random.PRNGKey(7)
        new_s, stats_s = jax.jit(static_step)(state_s, key)
        new_d, stats_d = jax.jit(dyn_step, static_argnames=())(
            state_d, key, _operands(**values)
        )
        for name in ("energy", "variance", "angular_momentum_square"):
            np.testing.assert_allclose(
                np.asarray(stats_d[name]), np.asarray(stats_s[name]),
                rtol=1e-6, err_msg=f"{optimizer}:{name}",
            )
        for leaf_s, leaf_d in zip(
            jax.tree.leaves(new_s.params), jax.tree.leaves(new_d.params)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_d), np.asarray(leaf_s), atol=1e-6,
                err_msg=optimizer,
            )


def test_penalty_sweep_shares_one_executable():
    """Different penalty values hit the same jit cache entry (no recompile)."""
    values = dict(lz_penalty=1.0, lz_center=2.0, l2_penalty=0.1)
    _, _, dyn_step, state = _setup("kfac", dynamic=True, **values)
    jitted = jax.jit(dyn_step)
    key = jax.random.PRNGKey(3)
    jax.block_until_ready(jitted(state, key, _operands(1.0, 2.0, 0.1))[1]["energy"])
    jax.block_until_ready(jitted(state, key, _operands(4.0, 5.0, 0.08))[1]["energy"])
    assert jitted._cache_size() == 1


def test_block_threads_penalties_and_matches_static():
    """The fused block forwards the operands; trajectory == static graph."""
    values = dict(lz_penalty=0.5, lz_center=1.0, l2_penalty=0.02)
    results = []
    for dynamic in (False, True):
        cfg, model, training_step, state = _setup("adam", dynamic=dynamic, **values)
        mcmc_net = jax.vmap(model.apply, in_axes=(None, 0))
        mcmc_step_fn = mcmc.make_mcmc_step(mcmc_net, steps=cfg.mcmc.steps)
        block = make_iteration_block(cfg, mcmc_step_fn, training_step)
        pm = jnp.zeros(cfg.mcmc.adapt_frequency)
        t = jnp.zeros((), jnp.int32)
        penalties = _operands(**values) if dynamic else None
        st, _, _, _, (stats, _) = block(
            state, jax.random.PRNGKey(11), pm, t, 3, penalties
        )
        results.append(
            (np.asarray(stats["energy"].real), np.asarray(jax.device_get(st.data)))
        )
    np.testing.assert_allclose(results[1][0], results[0][0], atol=1e-5)
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-5)

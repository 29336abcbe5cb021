"""Reduced-precision MCMC sampler: the bf16 tower and its precision boundary.

``blocks.tower_dtype(bf16)`` runs the Psiformer attention tower in bfloat16 —
used by the sweep only (``DEEPHALL_MCMC_DTYPE=bf16``, ``train.py``).  The
invariants pinned here:

* parameters stay float32 (checkpoint contract) and the orbital/determinant
  math stays float32/complex64 — only the feature tower is reduced;
* the reduced log|psi~| is a small, deterministic perturbation of log|psi|
  (the chain then samples |psi~|^2 *exactly* — Metropolis detailed balance
  does not care that psi~ != psi, so there is no sampling bias beyond the
  psi~ vs psi difference itself, measured on TPU against the Laughlin anchor);
* tracing outside the context is bit-identical to the baseline (the loss /
  local-energy paths never see the reduced tower).
"""

import jax
import jax.numpy as jnp
import pytest

from deephall_tpu.config import Config
from deephall_tpu.mcmc import make_mcmc_step
from deephall_tpu.networks import blocks, make_network


@pytest.fixture(scope="module")
def tiny_net():
    cfg = Config()
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 6
    cfg.network.psiformer.num_layers = 2
    cfg.network.psiformer.num_heads = 2
    cfg.network.psiformer.heads_dim = 8
    model = make_network(cfg.system, cfg.network)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 2)))
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (16, 3), minval=0.1, maxval=3.0)
    phi = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=-3.0, maxval=3.0)
    x = jnp.stack([theta, phi], axis=-1)
    return model, params, x


def test_bf16_tower_close_to_f32_and_param_tree_untouched(tiny_net):
    model, params, x = tiny_net
    lp_f32 = model.apply(params, x)

    with blocks.tower_dtype(jnp.bfloat16):
        lp_bf16 = jax.jit(model.apply)(params, x)

    # Params are never cast in the tree.
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(params)
    )
    # Output stays complex64 (the orbital head runs f32): the tower is the
    # only reduced stage.
    assert lp_bf16.dtype == lp_f32.dtype == jnp.complex64
    # log|psi~| is a small deterministic perturbation of log|psi|.
    assert jnp.max(jnp.abs(lp_bf16.real - lp_f32.real)) < 0.2
    assert jnp.max(jnp.abs(lp_bf16.real - lp_f32.real)) > 0  # actually reduced


def test_outside_context_bit_identical(tiny_net):
    model, params, x = tiny_net
    base = jax.jit(model.apply)(params, x)
    with blocks.tower_dtype(jnp.bfloat16):
        pass  # entering and leaving must not leak state
    again = jax.jit(lambda p, d: model.apply(p, d))(params, x)
    assert jnp.array_equal(base.real, again.real)
    assert jnp.array_equal(base.imag, again.imag)


def test_bf16_sweep_samples_and_keeps_positions_f32(tiny_net):
    model, params, x = tiny_net
    batch_network = jax.vmap(model.apply, in_axes=(None, 0))

    def reduced_network(p, d):
        # Mirrors the train.py DEEPHALL_MCMC_DTYPE=bf16 wrapper: the context
        # is entered inside the traced function so it binds at trace time.
        with blocks.tower_dtype(jnp.bfloat16):
            return batch_network(p, d)

    mcmc_step = jax.jit(make_mcmc_step(reduced_network, steps=5))
    data, pmove = mcmc_step(params, x, jax.random.PRNGKey(3), jnp.asarray(0.4))
    assert data.dtype == jnp.float32  # positions feed the f32 local energy
    assert data.shape == x.shape
    assert jnp.isfinite(data).all()
    assert 0.0 < float(pmove) <= 1.0
    # The chain moved: a wedged reduced-precision acceptance would freeze it.
    assert float(jnp.mean(jnp.any(data != x, axis=(-1, -2)))) > 0.3

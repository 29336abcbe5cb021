"""Fused Pallas jet-LayerNorm vs the primitive-chain composition.

The chain (`networks.fwdlap._layernorm`) is transitively pinned against the
full-Hessian physics oracles by ``tests/test_fwdlap.py``; exact agreement here
transfers that to the fused kernel.  Off-TPU the kernel runs in Pallas
interpret mode, so this exercises the same kernel code the chip executes.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from deephall_tpu.networks import fwdlap as nets_fwdlap
from deephall_tpu.ops import jet_layernorm
from deephall_tpu.ops.fwdlap import Jet


def random_jet(key, batch_shape, feat, channels, extras):
    keys = jax.random.split(key, 4)
    return Jet(
        jax.random.normal(keys[0], (*batch_shape, feat)),
        jax.random.normal(keys[1], (channels, *batch_shape, feat)),
        jax.random.normal(keys[2], (*batch_shape, feat)),
        jax.random.normal(keys[3], (extras, *batch_shape, feat)),
    )


def chain_layernorm(p, t):
    impl = nets_fwdlap.JET_LAYERNORM_IMPL
    nets_fwdlap.JET_LAYERNORM_IMPL = "chain"
    try:
        return nets_fwdlap._layernorm(p, t)
    finally:
        nets_fwdlap.JET_LAYERNORM_IMPL = impl


@pytest.mark.parametrize(
    "batch_shape,channels,extras",
    [
        ((16, 6), 13, 1),  # lean production shape (N=6): rows = 96
        ((16, 6), 15, 3),  # L2-every-step shape
        ((56,), 5, 1),     # flat batch, rows = 56 -> block 8
    ],
)
def test_fused_matches_chain(batch_shape, channels, extras):
    key = jax.random.PRNGKey(7)
    t = random_jet(key, batch_shape, 64, channels, extras)
    p = {
        "scale": jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.3 + 1.0,
        "bias": jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1,
    }
    assert jet_layernorm.supported(t)
    ref = chain_layernorm(p, t)
    got = jet_layernorm.layernorm_jet(p, t)
    for name, a, b in zip(Jet._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-6, atol=2e-6, err_msg=name
        )


def test_unsupported_shapes_fall_back():
    # Rows not divisible by any block candidate (e.g. the per-config protocol's
    # unbatched [N, D] activations with N=6) must take the chain path.
    t = random_jet(jax.random.PRNGKey(0), (6,), 32, 13, 1)
    assert not jet_layernorm.supported(t)
    t64 = random_jet(jax.random.PRNGKey(0), (6,), 32, 13, 1)
    double = Jet(
        t64.x.astype(jnp.float64) if jax.config.jax_enable_x64 else t64.x,
        t64.j, t64.l, t64.d,
    )
    assert not jet_layernorm.supported(double) or double.x.dtype == jnp.float32


@pytest.mark.parametrize("channels,extras", [(13, 1), (15, 3)])
def test_fused_residual_matches_add_then_chain(channels, extras):
    key = jax.random.PRNGKey(11)
    t = random_jet(key, (16, 6), 64, channels, extras)
    r = random_jet(jax.random.PRNGKey(12), (16, 6), 64, channels, extras)
    p = {
        "scale": jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.3 + 1.0,
        "bias": jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1,
    }
    from deephall_tpu.ops import fwdlap as ops_fwdlap

    ref = chain_layernorm(p, ops_fwdlap.add(t, r))
    got = jet_layernorm.layernorm_jet(p, t, residual=r)
    for name, a, b in zip(Jet._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-6, atol=2e-6, err_msg=name
        )


def test_dispatch_through_layernorm(monkeypatch):
    monkeypatch.setattr(nets_fwdlap, "JET_LAYERNORM_IMPL", "fused")
    t = random_jet(jax.random.PRNGKey(3), (8, 6), 32, 7, 3)
    p = {"scale": jnp.ones(32), "bias": jnp.zeros(32)}
    got = nets_fwdlap._layernorm(p, t)
    ref = chain_layernorm(p, t)
    np.testing.assert_allclose(np.asarray(got.l), np.asarray(ref.l), rtol=2e-6, atol=2e-6)

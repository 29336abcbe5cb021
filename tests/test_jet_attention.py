"""Fused Pallas jet-attention kernel vs the primitive-chain composition.

The chain (`networks.fwdlap._attention`, "vpu" lowering) is transitively
pinned against the full-Hessian physics oracles by ``tests/test_fwdlap.py``;
exact agreement here transfers that to the fused kernel.  Off-TPU the kernel
runs in Pallas interpret mode, so this exercises the same kernel code the chip
executes.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from deephall_tpu.networks import fwdlap as nets_fwdlap
from deephall_tpu.ops import jet_attention
from deephall_tpu.ops.fwdlap import Jet


def random_jet(key, batch, tokens, feat, channels, extras):
    keys = jax.random.split(key, 4)
    return Jet(
        jax.random.normal(keys[0], (batch, tokens, feat)),
        jax.random.normal(keys[1], (channels, batch, tokens, feat)),
        jax.random.normal(keys[2], (batch, tokens, feat)),
        jax.random.normal(keys[3], (extras, batch, tokens, feat)),
    )


def attention_params(key, feat, heads):
    head_dim = feat // heads
    keys = jax.random.split(key, 8)
    scale = 1.0 / np.sqrt(feat)
    p = {}
    for i, name in enumerate(("query", "key", "value")):
        p[name] = {
            "kernel": jax.random.normal(keys[2 * i], (feat, heads, head_dim)) * scale,
            "bias": jax.random.normal(keys[2 * i + 1], (heads, head_dim)) * 0.1,
        }
    p["out"] = {
        "kernel": jax.random.normal(keys[6], (heads, head_dim, feat)) * scale,
        "bias": jax.random.normal(keys[7], (feat,)) * 0.1,
    }
    return p


def chain_attention(p, heads, t):
    impl = nets_fwdlap.JET_ATTENTION_IMPL
    nets_fwdlap.JET_ATTENTION_IMPL = "vpu"
    try:
        return nets_fwdlap._attention(p, heads, t)
    finally:
        nets_fwdlap.JET_ATTENTION_IMPL = impl


@pytest.mark.parametrize(
    "channels,extras,tokens",
    [
        (13, 1, 6),  # lean production shape (N=6)
        (15, 3, 6),  # L2-every-step shape
        (17, 1, 8),  # N=8 lean (Jain nu=2/5 config)
    ],
)
def test_fused_matches_chain(channels, extras, tokens):
    t = random_jet(jax.random.PRNGKey(5), 16, tokens, 64, channels, extras)
    p = attention_params(jax.random.PRNGKey(6), 64, 4)
    assert jet_attention.supported(t)
    ref = chain_attention(p, 4, t)
    got = jet_attention.attention_jet(p, 4, t)
    for name, a, b in zip(Jet._fields, ref, got):
        scale = np.max(np.abs(np.asarray(a))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


def test_unsupported_shapes_fall_back():
    # The per-config protocol path carries unbatched [T, D] jets: not 3-D.
    t = random_jet(jax.random.PRNGKey(0), 8, 6, 32, 13, 1)
    unbatched = Jet(t.x[0], t.j[:, 0], t.l[0], t.d[:, 0])
    assert not jet_attention.supported(unbatched)
    # Batch with no walker-block divisor falls back too.
    odd = random_jet(jax.random.PRNGKey(1), 7, 6, 32, 13, 1)
    assert not jet_attention.supported(odd)


def test_vpu_contraction_variant(monkeypatch):
    # CONTRACT_IMPL is read at trace time; distinct shapes force a fresh trace
    # (the jitted kernel is cached per shape, not per variant).
    monkeypatch.setattr(jet_attention, "CONTRACT_IMPL", "vpu")
    t = random_jet(jax.random.PRNGKey(11), 4, 5, 32, 9, 2)
    p = attention_params(jax.random.PRNGKey(12), 32, 2)
    ref = chain_attention(p, 2, t)
    got = jet_attention.attention_jet(p, 2, t)
    for name, a, b in zip(Jet._fields, ref, got):
        scale = np.max(np.abs(np.asarray(a))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


def test_dispatch_through_attention(monkeypatch):
    monkeypatch.setattr(nets_fwdlap, "JET_ATTENTION_IMPL", "pallas")
    t = random_jet(jax.random.PRNGKey(3), 8, 6, 32, 7, 3)
    p = attention_params(jax.random.PRNGKey(4), 32, 4)
    got = nets_fwdlap._attention(p, 4, t)
    ref = chain_attention(p, 4, t)
    np.testing.assert_allclose(
        np.asarray(got.l), np.asarray(ref.l), rtol=2e-5, atol=2e-5
    )

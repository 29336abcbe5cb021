"""Network tests: flax equivalence of primitives, Psiformer shape/struct checks."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from deephall_tpu.config import Network, NetworkType, OrbitalType, System
from deephall_tpu.networks import blocks, make_network


def test_mha_matches_flax():
    """Our attention block must match flax.linen.MultiHeadAttention numerically."""
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
    ours = blocks.MultiHeadAttention(num_heads=2)
    theirs = nn.MultiHeadAttention(num_heads=2)
    v_ours = ours.init(jax.random.PRNGKey(1), x)
    v_theirs = theirs.init(jax.random.PRNGKey(1), x)
    # identical param structure (names and shapes)
    assert jax.tree.map(jnp.shape, v_ours) == jax.tree.map(jnp.shape, v_theirs)
    # identical output with shared weights
    out_ours = ours.apply(v_theirs, x)
    out_theirs = theirs.apply(v_theirs, x)
    assert jnp.allclose(out_ours, out_theirs, atol=1e-5)


def test_dense_matches_flax():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
    v = nn.Dense(16).init(jax.random.PRNGKey(1), x)
    out_flax = nn.Dense(16).apply(v, x)
    out_ours = blocks.Dense(16).apply(v, x)
    assert jnp.allclose(out_ours, out_flax, atol=1e-6)


def test_dense_general_matches_flax():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
    v = nn.DenseGeneral((3, 4, 2)).init(jax.random.PRNGKey(1), x)
    out_flax = nn.DenseGeneral((3, 4, 2)).apply(v, x)
    out_ours = blocks.DenseGeneral((3, 4, 2)).apply(v, x)
    assert jnp.allclose(out_ours, out_flax, atol=1e-6)
    # mid-axis contraction, as used by the sparse orbital lift
    y = jax.random.normal(jax.random.PRNGKey(2), (5, 8, 3, 2))
    v2 = nn.DenseGeneral(7, axis=1).init(jax.random.PRNGKey(3), y)
    out_flax2 = nn.DenseGeneral(7, axis=1).apply(v2, y)
    out_ours2 = blocks.DenseGeneral(7, axis=1).apply(v2, y)
    assert jnp.allclose(out_ours2, out_flax2, atol=1e-6)


def test_layernorm_matches_flax():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 8)) * 3 + 1
    v = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(1), x)
    v = jax.tree.map(lambda a: a + 0.3, v)  # nontrivial scale/bias
    out_flax = nn.LayerNorm(epsilon=1e-5).apply(v, x)
    out_ours = blocks.LayerNorm(epsilon=1e-5).apply(v, x)
    assert jnp.allclose(out_ours, out_flax, atol=1e-5)


def _sample(key, batch, nelec):
    k1, k2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(k1, (batch, nelec), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (batch, nelec), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


def test_psiformer_forward():
    system = System(flux=4, nspins=(3, 0))
    net = Network(type=NetworkType.psiformer)
    net.psiformer.num_heads = 2
    net.psiformer.heads_dim = 4
    net.psiformer.num_layers = 2
    model = make_network(system, net)
    data = _sample(jax.random.PRNGKey(0), 6, 3)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert out.shape == (6,)
    assert jnp.iscomplexobj(out)
    assert jnp.all(jnp.isfinite(out.real)) and jnp.all(jnp.isfinite(out.imag))

    # Parameter tree structure: reference flax auto-naming layout.
    top = set(params["params"].keys())
    assert top == {"PsiformerLayers_0", "Orbitals_0", "Jastrow_0"}
    layers = params["params"]["PsiformerLayers_0"]
    assert "MultiHeadAttention_0" in layers and "LayerNorm_3" in layers
    assert set(layers["MultiHeadAttention_0"].keys()) == {"query", "key", "value", "out"}


def test_psiformer_sparse_orbitals():
    system = System(flux=6, nspins=(3, 0))
    net = Network(type=NetworkType.psiformer, orbital=OrbitalType.sparse)
    net.psiformer.num_heads = 2
    net.psiformer.heads_dim = 4
    net.psiformer.num_layers = 1
    model = make_network(system, net)
    data = _sample(jax.random.PRNGKey(0), 4, 3)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out = jax.vmap(lambda x: model.apply(params, x))(data)
    assert jnp.all(jnp.isfinite(out.real))
    assert "lll_weight" in params["params"]["Orbitals_0"]


def test_kfac_collections():
    """Sown inputs and taps expose folded 2-D curvature interfaces."""
    system = System(flux=2, nspins=(3, 0))
    model = make_network(system, Network())
    data = _sample(jax.random.PRNGKey(0), 2, 3)
    params = model.init(jax.random.PRNGKey(1), data[0])
    out, aux = model.apply(
        params, data[0], mutable=[blocks.KFAC_IN, blocks.KFAC_TAPS]
    )
    ins = jax.tree.leaves(aux[blocks.KFAC_IN])
    taps = jax.tree.leaves(aux[blocks.KFAC_TAPS])
    assert len(taps) > 0 and len(ins) >= len(taps)
    for leaf in ins + taps:
        assert leaf.ndim == 2
    # taps are additive zeros: output unchanged
    out_plain = model.apply(params, data[0])
    assert jnp.allclose(out, out_plain)
    # providing taps reproduces the forward too
    out2 = model.apply({**params, blocks.KFAC_TAPS: aux[blocks.KFAC_TAPS]}, data[0])
    assert jnp.allclose(out2, out_plain)


def test_native_batching_matches_vmap():
    """model.apply on a [B, N, 2] batch must equal vmap over single configs."""
    system = System(flux=6, nspins=(3, 0))
    data = _sample(jax.random.PRNGKey(5), 7, 3)
    for net in (
        Network(type=NetworkType.psiformer),
        Network(type=NetworkType.psiformer, orbital=OrbitalType.sparse),
        Network(type=NetworkType.laughlin),
    ):
        net.psiformer.num_heads = 2
        net.psiformer.heads_dim = 4
        net.psiformer.num_layers = 2
        net.psiformer.determinants = 2
        model = make_network(system, net)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
        per_sample = jax.vmap(lambda x: model.apply(params, x))(data)
        batched = model.apply(params, data)
        assert batched.shape == per_sample.shape
        assert jnp.allclose(batched, per_sample, atol=1e-5), net.type


def test_fwd_tower_tb_matches_std(monkeypatch):
    """The token-major forward tower equals the standard batched forward."""
    system = System(flux=6, nspins=(3, 0))
    data = _sample(jax.random.PRNGKey(5), 7, 3)
    for net in (
        Network(type=NetworkType.psiformer),
        Network(type=NetworkType.psiformer, orbital=OrbitalType.sparse),
    ):
        net.psiformer.num_heads = 2
        net.psiformer.heads_dim = 4
        net.psiformer.num_layers = 2
        net.psiformer.determinants = 2
        model = make_network(system, net)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), data[0])
        std = model.apply(params, data)
        monkeypatch.setattr(blocks, "FWD_TOWER_IMPL", "tb")
        tb = model.apply(params, data)
        monkeypatch.setattr(blocks, "FWD_TOWER_IMPL", "std")
        assert jnp.allclose(tb, std, atol=1e-5), net.orbital
        # The per-config protocol path (ndim=2) must be untouched by the knob.
        monkeypatch.setattr(blocks, "FWD_TOWER_IMPL", "tb")
        single = model.apply(params, data[0])
        monkeypatch.setattr(blocks, "FWD_TOWER_IMPL", "std")
        assert jnp.allclose(single, std[0], atol=1e-5)


def test_attention_lowerings_agree(monkeypatch):
    """All three attention contraction lowerings produce the same numbers.

    The lowering is selected by ``blocks.ATTENTION_IMPL`` (env
    ``DEEPHALL_ATTENTION_IMPL``); every variant must stay numerically live.
    """
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 5, 8))  # batched [B, T, D]
    mha = blocks.MultiHeadAttention(num_heads=2)
    variables = mha.init(jax.random.PRNGKey(1), x)
    outs = {}
    for impl in ("vpu", "einsum", "bm"):
        monkeypatch.setattr(blocks, "ATTENTION_IMPL", impl)
        outs[impl] = mha.apply(variables, x)
    assert jnp.allclose(outs["vpu"], outs["einsum"], atol=1e-5)
    assert jnp.allclose(outs["vpu"], outs["bm"], atol=1e-5)

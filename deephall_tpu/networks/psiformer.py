"""Psiformer attention wavefunction on the monopole sphere.

Reimplementation of the reference network (``/root/reference/deephall/networks/
psiformer.py``, itself after Glehn et al., ICLR 2023): Cartesian + spin input features,
a stack of attention blocks with LayerNorms and tanh-MLP residuals, complex orbitals
against the monopole-harmonics envelope, a two-channel Jastrow factor, and a signed
log-sum of determinants.

Built from this framework's instrumented primitives (``blocks.py``) so the parameter
tree matches the reference layout exactly and KFAC can capture per-layer curvature
statistics without graph pattern matching.
"""

from __future__ import annotations

from flax import linen as nn
from jax import numpy as jnp

from deephall_tpu.config import OrbitalType
from deephall_tpu.networks import blocks
from deephall_tpu.networks.blocks import (
    Dense,
    Jastrow,
    LayerNorm,
    MultiHeadAttention,
    Orbitals,
)
from deephall_tpu.ops.slogdet import signed_logsumdet


class PsiformerLayers(nn.Module):
    """Attention feature tower over the electron axis."""

    num_heads: int
    heads_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, electrons: jnp.ndarray, spins: jnp.ndarray):
        theta, phi = electrons[..., 0], electrons[..., 1]
        h_one = self.input_feature(theta, phi, spins)
        # Reduced-precision tower (trace-time ambient, see blocks.tower_dtype):
        # activations and on-the-fly-cast parameters run in e.g. bfloat16
        # through the attention stack, halving the HBM traffic of the
        # bandwidth-bound tower.  The orbital head below always receives
        # float32 features; parameters stay float32 in the tree.
        dt = blocks.ambient_tower_dtype()
        if dt is not None:
            h_one = h_one.astype(dt)
        # Token-major layout (env-gated): every dense/layernorm/residual op in
        # the tower is axis(-1) generic, so moving the electron-token axis off
        # the tiled sublane position is two cheap transposes at the ends.
        tb = blocks.FWD_TOWER_IMPL == "tb" and electrons.ndim >= 3
        if tb:
            h_one = jnp.moveaxis(h_one, -2, 0)  # [*B, T, F] -> [T, *B, F]
        attention_dim = self.num_heads * self.heads_dim
        h_one = Dense(attention_dim, use_bias=False)(h_one)
        for _ in range(self.num_layers):
            attn_out = MultiHeadAttention(
                num_heads=self.num_heads, tokens_leading=tb
            )(h_one)
            h_one += Dense(attention_dim, use_bias=False)(attn_out)
            h_one = LayerNorm(epsilon=1e-5)(h_one)
            h_one += nn.tanh(Dense(attention_dim)(h_one))
            h_one = LayerNorm(epsilon=1e-5)(h_one)
        if tb:
            h_one = jnp.moveaxis(h_one, 0, -2)  # back to [*B, T, D]
        if dt is not None:
            h_one = h_one.astype(jnp.float32)
        return h_one

    def input_feature(self, theta: jnp.ndarray, phi: jnp.ndarray, spins: jnp.ndarray):
        return jnp.stack(
            [
                jnp.cos(theta),
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
                jnp.broadcast_to(spins, theta.shape),
            ],
            axis=-1,
        )


class Psiformer(nn.Module):
    nspins: tuple[int, int]
    Q: float
    ndets: int
    num_heads: int
    heads_dim: int
    num_layers: int
    orbital_type: OrbitalType

    def __call__(self, electrons):
        return signed_logsumdet(self.orbitals(electrons))

    @nn.compact
    def orbitals(self, electrons):
        theta, phi = electrons[..., 0], electrons[..., 1]
        spins = jnp.array([1] * self.nspins[0] + [-1] * self.nspins[1])
        h_one = PsiformerLayers(
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            heads_dim=self.heads_dim,
        )(electrons, spins)
        orbitals = Orbitals(
            type=self.orbital_type, Q=self.Q, nspins=self.nspins, ndets=self.ndets
        )(h_one, theta, phi)
        jastrow = Jastrow(self.nspins)(electrons)  # [...] (scalar per config)
        return jnp.exp(jastrow / sum(self.nspins))[..., None, None, None] * orbitals

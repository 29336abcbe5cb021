"""Neural building blocks: instrumented dense layers, attention, orbitals, Jastrow.

The dense/attention/layer-norm primitives here are this framework's own
implementations (not re-exports of Flax's), written so that

* the parameter pytree is **checkpoint-compatible with the reference**: class names,
  submodule names and kernel shapes match what ``flax.linen`` auto-names produce in the
  reference Psiformer (``/root/reference/deephall/networks/psiformer.py:37-49``,
  ``blocks.py:23-70``), so reference-trained ``.npz`` checkpoints load directly;

* every layer carries **KFAC instrumentation**: inputs are sown (for the activation
  Kronecker factor A) and outputs accept an additive zero "tap" (whose cotangent in a
  single batched VJP yields the output-sensitivity factor G).  Both are exposed as
  flat 2-D ``[repeats, fan]`` matrices so the optimizer needs no per-layer shape logic.
  The collections are inert unless the KFAC optimizer asks for them — normal forward
  passes trace to exactly the plain dense math.
"""

from __future__ import annotations

import contextlib
import math
import os
from collections.abc import Sequence

import jax
import numpy as np
from flax import linen as nn
from jax import numpy as jnp

from deephall_tpu.config import OrbitalType
from deephall_tpu.geometry import chord_distances, spinors

# Collection names used by the KFAC optimizer.
KFAC_IN = "kfac_in"  # sown layer inputs, folded to [repeats, fan_in]
KFAC_TAPS = "kfac_taps"  # additive output taps, folded to [repeats, fan_out]

# Cotangent that turns tap sensitivities into exact-Fisher factors: the
# predictive distribution is a scalar Gaussian over Re log psi with variance
# 1/2, so the Fisher is E[g g^T] with g = sqrt(2) d(Re log psi)/d(tap).
FISHER_COTANGENT = math.sqrt(2.0)


def zero_taps(model, params, data):
    """Zero-filled KFAC tap collection matching ``model.apply``'s tap shapes.

    Shared by the fused loss+capture estimator (``loss.py``) and the
    standalone KFAC capture (``optimizers/kfac.py``) so the tap layout and
    discovery logic cannot drift between the two curvature paths.
    """

    def shape_fn(p, d):
        _, aux = model.apply(dict(p), d, mutable=[KFAC_TAPS])
        return aux[KFAC_TAPS]

    struct = jax.eval_shape(shape_fn, params, data)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), struct)

default_kernel_init = nn.initializers.lecun_normal()

# Attention contraction lowering: "vpu" (broadcast-multiply-reduce), "einsum"
# (MXU batched gemms), "bm" (batch-minor lanes layout; batched inputs only), or
# "auto".  Overridable for benchmarking via DEEPHALL_ATTENTION_IMPL.
ATTENTION_IMPL = os.environ.get("DEEPHALL_ATTENTION_IMPL", "vpu")

# Forward tower layout: "std" keeps [*B, T, D] activations; "tb" (token-major,
# batched inputs only) runs the tower with [T, *B, D] so the tiled minor dims
# are (B, D) — the T electron tokens otherwise pad the 8-sublane axis on every
# elementwise access (6/8 at N=6).  Mirrors DEEPHALL_JET_TOWER_IMPL=tb on the
# jet side; parameter tree unchanged.
FWD_TOWER_IMPL = os.environ.get("DEEPHALL_FWD_TOWER_IMPL", "std")

# Ambient compute dtype for the attention feature tower, read at TRACE time
# (set it inside the traced function body, e.g. around the MCMC sweep's network
# calls).  None = float32.  The parameter tree always stays float32 (checkpoint
# contract); Dense/DenseGeneral/LayerNorm cast their parameters to the
# activation dtype on the fly, and LayerNorm keeps its statistics in float32.
# Consumer: the reduced-precision MCMC sampler (DEEPHALL_MCMC_DTYPE=bf16) —
# the sweep's forwards do not feed the local energy (CLAUDE.md precision
# invariant), only the *positions* they sample do, and a deterministic
# reduced-precision log|psi~| still satisfies detailed balance exactly for
# |psi~|^2.  Physics boundary validated against the exact Laughlin inference
# anchor (BASELINE.md).
_TOWER_DTYPE: list = [None]


@contextlib.contextmanager
def tower_dtype(dtype):
    """Trace-time context: run the feature tower in ``dtype`` (e.g. bfloat16)."""
    _TOWER_DTYPE.append(dtype)
    try:
        yield
    finally:
        _TOWER_DTYPE.pop()


def ambient_tower_dtype():
    return _TOWER_DTYPE[-1]


def _sow_input(mdl: nn.Module, x2d: jnp.ndarray) -> None:
    if mdl.is_mutable_collection(KFAC_IN) and not mdl.is_initializing():
        mdl.sow(KFAC_IN, "a", x2d)


def _tap_output(mdl: nn.Module, y2d: jnp.ndarray) -> jnp.ndarray:
    """Add the KFAC output tap (zeros) so its VJP cotangent equals dL/dy."""
    if mdl.is_initializing():
        return y2d
    if mdl.has_variable(KFAC_TAPS, "tap"):
        return y2d + mdl.get_variable(KFAC_TAPS, "tap")
    if mdl.is_mutable_collection(KFAC_TAPS):
        # Shape-capture pass: create the zero tap so callers learn its shape.
        tap = mdl.variable(KFAC_TAPS, "tap", jnp.zeros, y2d.shape, y2d.dtype)
        return y2d + tap.value
    return y2d


def _canonical_axes(axis, ndim: int) -> tuple[int, ...]:
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    return tuple(sorted(a % ndim for a in axes))


class DenseGeneral(nn.Module):
    """Linear transform over arbitrary contraction axes (flax-compatible params).

    Kernel shape ``(*contracted_dims, *features)``; bias shape ``features``.
    """

    features: int | Sequence[int]
    axis: int | Sequence[int] = -1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = (
            (self.features,) if isinstance(self.features, int) else tuple(self.features)
        )
        axes = _canonical_axes(self.axis, x.ndim)
        contract_shape = tuple(x.shape[a] for a in axes)
        kernel = self.param(
            "kernel", default_kernel_init, (*contract_shape, *features), jnp.float32
        )
        batch_axes = tuple(a for a in range(x.ndim) if a not in axes)
        batch_shape = tuple(x.shape[a] for a in batch_axes)

        # Fold to 2-D: [prod(batch), fan_in] @ [fan_in, fan_out].
        fan_in = math.prod(contract_shape) if contract_shape else 1
        fan_out = math.prod(features) if features else 1
        x2d = jnp.transpose(x, batch_axes + axes).reshape(-1, fan_in)
        _sow_input(self, x2d)
        kernel2d = kernel.reshape(fan_in, fan_out)
        if x.dtype != jnp.float32:
            # Complex activations (orbital head) and reduced-precision tower
            # activations (tower_dtype) both compute in the activation dtype;
            # the stored parameter stays float32 (checkpoint contract).
            kernel2d = kernel2d.astype(x.dtype)
        y2d = x2d @ kernel2d
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), features, jnp.float32)
            y2d = y2d + bias.reshape(1, fan_out).astype(y2d.dtype)
        y2d = _tap_output(self, y2d)
        return y2d.reshape(*batch_shape, *features)


class Dense(nn.Module):
    """Standard dense layer on the last axis (flax-compatible params)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", default_kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        x2d = x.reshape(-1, x.shape[-1])
        _sow_input(self, x2d)
        if x.dtype != jnp.float32:
            kernel = kernel.astype(x.dtype)  # reduced-precision tower
        y2d = x2d @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y2d = y2d + bias.astype(y2d.dtype)
        y2d = _tap_output(self, y2d)
        return y2d.reshape(*x.shape[:-1], self.features)


class LayerNorm(nn.Module):
    """Layer normalization over the last axis (flax-compatible params)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Statistics in float32 even for a reduced-precision tower: XLA fuses
        # the up/downcasts into the surrounding elementwise chain, so memory
        # traffic stays in the activation dtype while the mean/variance
        # accumulation keeps full precision.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        x_hat = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,), jnp.float32)
        _sow_input(self, x_hat.reshape(-1, feat))
        y2d = (
            x_hat * scale.astype(x.dtype) + bias.astype(x.dtype)
        ).reshape(-1, feat)
        y2d = _tap_output(self, y2d)
        return y2d.reshape(x.shape)


class MultiHeadAttention(nn.Module):
    """Self-attention over the electron axis (flax-compatible params).

    Matches ``flax.linen.MultiHeadAttention(num_heads=H)`` applied to ``[T, D]``
    inputs as used by the reference (``psiformer.py:44``): qkv projections named
    ``query``/``key``/``value`` with kernels ``[D, H, D//H]``, scaled dot-product
    softmax attention, and an output projection named ``out`` with kernel
    ``[H, D//H, D]``.
    """

    num_heads: int
    tokens_leading: bool = False  # token-major tower layout [T, *B, D]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        head_dim = features // self.num_heads
        query = DenseGeneral((self.num_heads, head_dim), name="query")(x)
        key = DenseGeneral((self.num_heads, head_dim), name="key")(x)
        value = DenseGeneral((self.num_heads, head_dim), name="value")(x)

        query = query / jnp.sqrt(head_dim).astype(x.dtype)
        if self.tokens_leading:
            # Token-major tower layout ([T, *B, D], see PsiformerLayers): same
            # lane-filling softmax chain as the bm branch below, entered from a
            # tokens-leading relayout.
            b_shape = x.shape[1:-1]
            t = x.shape[0]

            def lanes(a):  # [T, *B, H, dh] -> [T, H, dh, B]
                return jnp.moveaxis(a.reshape(t, -1, *a.shape[-2:]), 1, -1)

            qt, kt, vt = lanes(query), lanes(key), lanes(value)
            logits = jnp.sum(qt[:, None] * kt[None], axis=-2)
            weights = jax.nn.softmax(logits, axis=1)
            attn = jnp.sum(weights[..., None, :] * vt[None], axis=1)
            attn = jnp.moveaxis(attn, -1, 1).reshape(t, *b_shape, *attn.shape[-3:-1])
            return DenseGeneral(features, axis=(-2, -1), name="out")(attn)
        if x.ndim >= 3 and ATTENTION_IMPL in ("bm", "auto"):
            # Natively-batched fast path with the walker batch in the minor (lane)
            # dimension.  TPU maps the last axis to the 128-wide vector lanes; with
            # T=S~6 electron tokens and H~4 heads, any [.., T, S, H] layout uses <5%
            # of the lanes, while [T, S, H, B] with B in the thousands uses them
            # fully.  The transposes move ~MBs and are far cheaper than the wasted
            # lanes, especially through the Hessian's linearized passes.
            b_shape = x.shape[:-2]
            qt = jnp.moveaxis(query.reshape(-1, *query.shape[-3:]), 0, -1)
            kt = jnp.moveaxis(key.reshape(-1, *key.shape[-3:]), 0, -1)
            vt = jnp.moveaxis(value.reshape(-1, *value.shape[-3:]), 0, -1)
            # [T, H, d, B] x [S, H, d, B] -> [T, S, H, B]
            logits = jnp.sum(qt[:, None] * kt[None], axis=-2)
            weights = jax.nn.softmax(logits, axis=1)
            # [T, S, H, B] x [S, H, d, B] -> [T, H, d, B]
            attn = jnp.sum(weights[..., None, :] * vt[None], axis=1)
            attn = jnp.moveaxis(attn, -1, 0).reshape(
                *b_shape, *attn.shape[:-1]
            )
            return DenseGeneral(features, axis=(-2, -1), name="out")(attn)
        if ATTENTION_IMPL == "vpu":
            # TPU note: with only a handful of electron tokens, per-head [T, d] x
            # [d, S] batched gemms waste the 128x128 MXU (<1% utilisation).
            # Broadcast-multiply-reduce keeps the contraction on the VPU, where XLA
            # fuses it (~30% faster forward at production shapes).
            # [..., T, H, d] x [..., S, H, d] -> [..., T, S, H]
            logits = jnp.sum(
                query[..., :, None, :, :] * key[..., None, :, :, :], axis=-1
            )
            weights = jax.nn.softmax(logits, axis=-2)
            # [..., T, S, H] x [..., S, H, d] -> [..., T, H, d]
            attn = jnp.sum(
                weights[..., None] * value[..., None, :, :, :], axis=-3
            )
        else:  # "einsum": MXU batched-gemm lowering
            logits = jnp.einsum("...thd,...shd->...hts", query, key)
            weights = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("...hts,...shd->...thd", weights, value)
        return DenseGeneral(features, axis=(-2, -1), name="out")(attn)


class FeaturedOrbitals(nn.Module):
    """Complex orbital head: real + i*imag dense projections per spin sector.

    Reference ``blocks.py:23-35``.
    """

    nspins: tuple[int, int]
    features: Sequence[int]

    @nn.compact
    def __call__(self, h_one: jnp.ndarray) -> jnp.ndarray:
        orbital_list = [
            DenseGeneral(tuple(self.features))(h_alpha)
            + 1j * DenseGeneral(tuple(self.features))(h_alpha)
            for h_alpha in jnp.split(h_one, (self.nspins[0],), axis=-2)
            if h_alpha.shape[-2]
        ]
        return jnp.concatenate(orbital_list, axis=-4)


class Orbitals(nn.Module):
    """Orbitals = learned features contracted against the monopole-harmonics envelope.

    ``full``: one learned feature per LLL orbital (2Q+1), summed against the envelope
    ``sqrt(C(2Q, Q-m)) u^{Q+m} v^{Q-m}``.  ``sparse``: 8 learned features lifted to
    2Q+1 by a learned complex linear map.  Reference ``blocks.py:38-70``.
    """

    type: OrbitalType
    Q: float
    nspins: tuple[int, int]
    ndets: int

    def setup(self):
        n_orb = int(2 * self.Q) + 1
        self.norm_factor = jnp.asarray(
            np.sqrt([math.comb(n_orb - 1, k) for k in range(n_orb)]), jnp.float32
        )
        if self.type == OrbitalType.full:
            self.featured_orbitals = FeaturedOrbitals(
                nspins=self.nspins,
                features=(n_orb, sum(self.nspins), self.ndets),
            )
        elif self.type == OrbitalType.sparse:
            self.featured_orbitals = FeaturedOrbitals(
                nspins=self.nspins,
                features=(8, sum(self.nspins), self.ndets),
            )
            self.lll_weight = DenseGeneral(n_orb, axis=-3)  # contract the 8 features

    def __call__(self, h_one, theta, phi):
        orbitals = self.featured_orbitals(h_one)  # [..., N, F, nelec, ndet] complex
        if self.type == OrbitalType.sparse:
            # Lift 8 features to 2Q+1 envelope channels; feature axis back to -3.
            orbitals = jnp.moveaxis(self.lll_weight(orbitals), -1, -3)

        m = jnp.arange(-self.Q, self.Q + 1)
        u, v = spinors(theta, phi)
        u, v = u[..., None], v[..., None]
        envelope = (
            self.norm_factor * u ** (self.Q + m) * v ** (self.Q - m)
        )  # [..., N, 2Q+1]
        orbitals = jnp.sum(
            orbitals * envelope[..., None, None], axis=-3
        )  # [..., N, nelec, ndet]
        return jnp.moveaxis(orbitals, -1, -3)  # [..., ndet, N, nelec]


class Jastrow(nn.Module):
    """Two-parameter electron-electron cusp factor on chord distances.

    Separate parallel- and antiparallel-spin channels (reference ``blocks.py:73-121``).
    """

    nspins: tuple[int, int]

    @nn.compact
    def __call__(self, electrons: jnp.ndarray) -> jnp.ndarray:
        n_up, n_down = self.nspins
        r_ee = chord_distances(electrons)  # [..., N, N]

        iu_up = jnp.triu_indices(n_up, k=1)
        iu_down = jnp.triu_indices(n_down, k=1)
        r_parallel = jnp.concatenate(
            [
                r_ee[..., :n_up, :n_up][..., iu_up[0], iu_up[1]],
                r_ee[..., n_up:, n_up:][..., iu_down[0], iu_down[1]],
            ],
            axis=-1,
        )

        if r_parallel.shape[-1] > 0:
            alpha_par = self.param("ee_par", nn.initializers.ones, (1,))
            jastrow_ee_par = jnp.sum(
                -(0.25 * alpha_par**2) / (alpha_par + r_parallel), axis=(-1,)
            )
        else:
            jastrow_ee_par = jnp.zeros(r_ee.shape[:-2])

        # The anti channel exists whenever n_up > 0, even for polarized systems
        # where the (n_up, 0) block sums to zero — the reference registers the
        # parameter in that case too (blocks.py:99-106) and param trees must match
        # in both directions for checkpoint compatibility.
        if n_up > 0:
            alpha_anti = self.param("ee_anti", nn.initializers.ones, (1,))
            r_anti = r_ee[..., :n_up, n_up:]
            jastrow_ee_anti = jnp.sum(
                -(0.5 * alpha_anti**2) / (alpha_anti + r_anti), axis=(-2, -1)
            )
        else:
            jastrow_ee_anti = jnp.zeros(r_ee.shape[:-2])

        return jastrow_ee_anti + jastrow_ee_par

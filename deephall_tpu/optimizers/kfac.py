"""Mesh-native KFAC optimizer, built from scratch for the TPU SPMD stack.

The reference delegates to ``kfac_jax`` with custom curvature machinery for
vmapped/complex dense layers (``/root/reference/deephall/optimizers/kfac.py``): a
``repeated_dense`` layer tag discovered by jaxpr graph-pattern matching, a
``RepeatedDenseBlock`` that folds electron/repeat axes into the batch for the Kronecker
factors (with a real-part cast for complex layers), exact-Fisher estimation from the
registered normal predictive distribution on ``Re log psi``, EMA'd factors, pi-split
damping, and a norm constraint — all replicated per device under ``pmap``.

This implementation reproduces that curvature model natively:

* **No graph matching.**  The framework's dense layers sow their (folded, 2-D) inputs
  and accept additive zero output taps (``networks/blocks.py``).  One batched VJP of
  ``sqrt(2) * sum_b Re log psi_b`` w.r.t. the taps yields every layer's per-walker
  output sensitivities — the exact Fisher of the scalar normal predictive distribution
  N(Re log psi, 1/2) needs no sampling because the output is one-dimensional.
* **Kronecker blocks** ``F_l ~= T * A (x) G`` with ``A = E_{BT}[a a^T]`` (bias column
  appended), ``G = E_{BT}[dy dy^T]``, repeat count ``T`` folded exactly as the
  reference's ``RepeatedDenseBlock.fixed_scale`` (``kfac.py:73-75``); complex layers
  contribute their real parts (``kfac.py:89-94``).
* **Diagonal blocks** for LayerNorm scale/bias (exact per-walker squared gradients from
  the same tap cotangents), **identity blocks** for the few remaining parameters
  (Jastrow cusps).
* **Global-batch statistics**: factor moments are plain means over the sharded walker
  axis; XLA partitions them into per-shard matmuls plus one ICI all-reduce — the
  mesh-native equivalent of kfac_jax's pmap'd factor averaging.

Preconditioning solves ``(sqrt(T) A + pi_A I) dW (sqrt(T) G + pi_G I) = g`` per layer
with pi-split damping, then applies the reference's norm constraint
(``lr^2 d^T F d <= c``) and learning-rate schedule with zero momentum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
from flax import traverse_util
from jax import numpy as jnp

from deephall_tpu.config import OptimizerKfac
from deephall_tpu.networks.blocks import (
    FISHER_COTANGENT,
    KFAC_IN,
    KFAC_TAPS,
    zero_taps,
)
from deephall_tpu.types import (
    ArrayTree,
    CheckpointState,
    PRNGKey,
    TrainingInit,
    TrainingStep,
)


class KfacState(NamedTuple):
    """EMA'd curvature state. All leaves are plain arrays (picklable)."""

    kron: dict  # path -> {"a": [in+?, in+?], "g": [out, out]}
    diag: dict  # path -> {"scale": [f], "bias": [f]}
    weight: jnp.ndarray  # EMA normalizer
    step: jnp.ndarray  # int32 step counter


class _LayerSpec(NamedTuple):
    path: tuple[str, ...]  # module path, e.g. ("PsiformerLayers_0", "Dense_0")
    kind: str  # "kron" | "diag"
    has_bias: bool
    repeats: int  # tokens folded into the batch (fixed_scale T)


def _module_paths(tree: dict) -> dict[tuple[str, ...], jnp.ndarray]:
    """Flatten a collection tree to {module_path: leaf}, dropping leaf names."""
    out = {}
    for path, leaf in traverse_util.flatten_dict(tree).items():
        # sown leaves are tuples ('a', (x,)); taps are ('tap', x)
        if isinstance(leaf, tuple):
            leaf = leaf[0]
        out[tuple(path[:-1])] = leaf
    return out


def _path_key(path: tuple[str, ...]) -> str:
    return "/".join(path)


def make_kfac_training_step(
    optim_cfg: OptimizerKfac, loss_grad_fn, model, sample_config, capture_fn=None
) -> tuple[TrainingInit, TrainingStep]:
    """Build the KFAC (init, step) pair.

    Args:
        optim_cfg: KFAC hyperparameters (lr schedule, damping, EMA, norm constraint).
        loss_grad_fn: ``(params, data) -> (stats, grads)`` energy-gradient estimator.
        model: The flax wavefunction module (provides the tap/sow collections).
        sample_config: One electron configuration ``[nelec, 2]`` for shape discovery.
        capture_fn: Optional fused ``(params, data) -> (stats, grads, sown, dy)``
            estimator (``loss.make_loss_and_capture_fn``) that shares one
            forward pass between the gradient VJP and the curvature capture;
            when given, ``loss_grad_fn`` and the separate capture pass are
            bypassed.

    Returns:
        ``(init, step)`` with the reference training-step interface.
    """
    damping = optim_cfg.damping
    ema = optim_cfg.curvature_ema
    norm_constraint = optim_cfg.norm_constraint

    def _discover(params: ArrayTree) -> tuple[list[_LayerSpec], dict, dict]:
        """Shape-capture pass: find instrumented layers and tap/input shapes."""
        variables = dict(params)
        _, aux = model.apply(
            variables, sample_config, mutable=[KFAC_TAPS, KFAC_IN]
        )
        taps = _module_paths(aux[KFAC_TAPS])
        sown = _module_paths(aux[KFAC_IN])
        param_mods: dict[tuple[str, ...], dict] = {}
        for path, leaf in traverse_util.flatten_dict(params["params"]).items():
            param_mods.setdefault(tuple(path[:-1]), {})[path[-1]] = leaf
        specs = []
        for path, tap in taps.items():
            if path not in param_mods or path not in sown:
                continue
            names = set(param_mods[path])
            if "kernel" in names:
                specs.append(
                    _LayerSpec(path, "kron", "bias" in names, int(tap.shape[0]))
                )
            elif "scale" in names:
                specs.append(_LayerSpec(path, "diag", True, int(tap.shape[0])))
        tap_shapes = {p: (t.shape, t.dtype) for p, t in taps.items()}
        return specs, tap_shapes, param_mods

    def _capture(params: ArrayTree, data: jnp.ndarray):
        """One batched VJP: per-layer inputs (sown) and output sensitivities (taps).

        The model runs natively batched, so tap/sow leaves are flat
        ``[batch * repeats, fan]`` matrices.
        """

        taps0 = zero_taps(model, params, data)

        def f(taps):
            variables = dict(params)
            variables[KFAC_TAPS] = taps
            out, aux = model.apply(variables, data, mutable=[KFAC_IN])
            return jnp.sum(out.real) * FISHER_COTANGENT, aux[KFAC_IN]

        _, pullback, sown = jax.vjp(f, taps0, has_aux=True)
        (dy,) = pullback(jnp.ones(()))
        return _module_paths(sown), _module_paths(dy)

    # ----- curvature statistics ------------------------------------------------

    def _factor_update(specs, sown, dy):
        kron, diag = {}, {}
        for spec in specs:
            a = sown[spec.path]  # [B*T, fan_in]
            g = dy[spec.path]  # [B*T, fan_out]
            a = a.real if jnp.iscomplexobj(a) else a
            g = g.real if jnp.iscomplexobj(g) else g
            rows = a.shape[0]
            if spec.kind == "kron":
                if spec.has_bias:
                    a = jnp.concatenate([a, jnp.ones((rows, 1), a.dtype)], -1)
                kron[_path_key(spec.path)] = {
                    "a": (a.T @ a) / rows,
                    "g": (g.T @ g) / rows,
                }
            else:  # diag (LayerNorm): exact per-walker squared gradients
                a3 = a.reshape(-1, spec.repeats, a.shape[-1])
                g3 = g.reshape(-1, spec.repeats, g.shape[-1])
                g_scale = jnp.sum(g3 * a3, axis=1)  # [B, f]
                g_bias = jnp.sum(g3, axis=1)
                diag[_path_key(spec.path)] = {
                    "scale": jnp.mean(g_scale**2, axis=0),
                    "bias": jnp.mean(g_bias**2, axis=0),
                }
        return kron, diag

    # ----- preconditioning -----------------------------------------------------

    def _precondition(specs, state: KfacState, grads: ArrayTree):
        """Solve the damped blockwise system; returns (updates, quad_norm)."""
        flat_grads = traverse_util.flatten_dict(grads["params"])
        updates = dict(flat_grads)
        quad = 0.0
        spec_by_path = {s.path: s for s in specs}
        handled: set[tuple[str, ...]] = set()
        weight = jnp.maximum(state.weight, 1e-8)

        for path, spec in spec_by_path.items():
            key = _path_key(path)
            if spec.kind == "kron":
                a_mat = state.kron[key]["a"] / weight
                g_mat = state.kron[key]["g"] / weight
                scale = np.sqrt(float(spec.repeats))
                a_mat = a_mat * scale
                g_mat = g_mat * scale
                # pi-split damping
                dim_a, dim_g = a_mat.shape[0], g_mat.shape[0]
                tr_a = jnp.trace(a_mat) / dim_a
                tr_g = jnp.trace(g_mat) / dim_g
                pi = jnp.sqrt(jnp.maximum(tr_a, 1e-20) / jnp.maximum(tr_g, 1e-20))
                damp_a = jnp.sqrt(damping) * pi
                damp_g = jnp.sqrt(damping) / pi
                a_damped = a_mat + damp_a * jnp.eye(dim_a, dtype=a_mat.dtype)
                g_damped = g_mat + damp_g * jnp.eye(dim_g, dtype=g_mat.dtype)

                kernel = flat_grads[(*path, "kernel")]
                kshape = kernel.shape
                fan_out = g_mat.shape[0]
                gmat = kernel.reshape(-1, fan_out)
                if spec.has_bias:
                    bias = flat_grads[(*path, "bias")].reshape(1, fan_out)
                    gmat = jnp.concatenate([gmat, bias], axis=0)
                # delta = A^-1 g G^-1
                delta = jnp.linalg.solve(a_damped, gmat)
                delta = jnp.linalg.solve(g_damped, delta.T).T
                # quadratic norm d^T F d with the damped factors
                quad += jnp.sum(delta * (a_damped @ delta @ g_damped))
                if spec.has_bias:
                    updates[(*path, "bias")] = delta[-1].reshape(
                        flat_grads[(*path, "bias")].shape
                    )
                    delta = delta[:-1]
                    handled.add((*path, "bias"))
                updates[(*path, "kernel")] = delta.reshape(kshape)
                handled.add((*path, "kernel"))
            else:  # diag
                for name in ("scale", "bias"):
                    d = state.diag[key][name] / weight + damping
                    g_leaf = flat_grads[(*path, name)]
                    delta = g_leaf / d
                    quad += jnp.sum(delta * d * delta)
                    updates[(*path, name)] = delta
                    handled.add((*path, name))

        for path, g_leaf in flat_grads.items():
            if path not in handled:  # identity block (e.g. Jastrow cusps)
                delta = g_leaf / damping
                quad += jnp.sum(delta * damping * delta)
                updates[path] = delta

        out = dict(grads)
        out["params"] = traverse_util.unflatten_dict(updates)
        return out, quad

    # ----- public interface ----------------------------------------------------

    def init(params: ArrayTree, key: PRNGKey, data: jnp.ndarray) -> KfacState:
        del key, data
        specs, tap_shapes, _ = _discover(params)
        kron = {}
        diag = {}
        for spec in specs:
            key_ = _path_key(spec.path)
            shape, _ = tap_shapes[spec.path]
            fan_out = shape[-1]
            if spec.kind == "kron":
                kernel = traverse_util.flatten_dict(params["params"])[
                    (*spec.path, "kernel")
                ]
                fan_in = int(np.prod(kernel.shape)) // fan_out + int(spec.has_bias)
                kron[key_] = {
                    "a": jnp.zeros((fan_in, fan_in)),
                    "g": jnp.zeros((fan_out, fan_out)),
                }
            else:
                diag[key_] = {
                    "scale": jnp.zeros((fan_out,)),
                    "bias": jnp.zeros((fan_out,)),
                }
        return KfacState(
            kron=kron, diag=diag, weight=jnp.zeros(()), step=jnp.zeros((), jnp.int32)
        )

    def step(state: CheckpointState, key: PRNGKey, penalties: dict | None = None):
        params, data, opt_state, mcmc_width = state
        specs, tap_shapes, _ = _discover(params)

        # Forward the dynamic-penalty operands only when present so plain
        # ``(params, data)`` estimators (tests, external callers) keep working.
        loss_args = (params, data, penalties) if penalties else (params, data)
        if capture_fn is not None:
            stats, grads, sown, dy = capture_fn(*loss_args)
            sown, dy = _module_paths(sown), _module_paths(dy)
        else:
            stats, grads = loss_grad_fn(*loss_args)
            sown, dy = _capture(params, data)
        kron_new, diag_new = _factor_update(specs, sown, dy)

        kron = jax.tree.map(
            lambda old, new: ema * old + (1 - ema) * new, opt_state.kron, kron_new
        )
        diag = jax.tree.map(
            lambda old, new: ema * old + (1 - ema) * new, opt_state.diag, diag_new
        )
        weight = ema * opt_state.weight + (1 - ema)
        new_opt_state = KfacState(
            kron=kron, diag=diag, weight=weight, step=opt_state.step + 1
        )

        deltas, quad = _precondition(specs, new_opt_state, grads)
        lr = optim_cfg.lr.schedule(opt_state.step)
        # Norm constraint (reference kfac.py:206): lr^2 d^T F d <= c
        coeff = jnp.minimum(
            1.0, jnp.sqrt(norm_constraint / jnp.maximum(lr**2 * quad, 1e-20))
        )
        new_params = jax.tree.map(
            lambda p, d: (p - lr * coeff * d).astype(p.dtype), params, deltas
        )
        return (
            CheckpointState(new_params, data, new_opt_state, mcmc_width),
            stats,
        )

    return init, step

"""Loss tests: the single-VJP tangent must equal the reference's per-sample estimator."""

import jax
import jax.numpy as jnp

from deephall_tpu.config import Network, System
from deephall_tpu.loss import LossMode, iqr_clip, make_loss_fn
from deephall_tpu.networks import make_network


def _setup(batch=8):
    system = System(flux=2, nspins=(3, 0), interaction_strength=0.0)
    net = Network()
    net.psiformer.num_layers = 1
    net.psiformer.num_heads = 1
    net.psiformer.heads_dim = 4
    model = make_network(system, net)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    theta = jnp.arccos(jax.random.uniform(k1, (batch, 3), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (batch, 3), minval=-jnp.pi, maxval=jnp.pi)
    data = jnp.stack([theta, phi], axis=-1)
    params = model.init(k3, data[0])
    return system, model, params, data


def _reference_tangent(network, params, data, diff):
    """Reference estimator: per-sample parameter gradients, then weighted nanmean
    (``/root/reference/deephall/loss.py:53-64,96-106``)."""
    df_real = jax.vmap(
        jax.value_and_grad(lambda p, x: network(p, x).real), in_axes=(None, 0)
    )
    df_imag = jax.vmap(
        jax.value_and_grad(lambda p, x: network(p, x).imag), in_axes=(None, 0)
    )
    _, tangent_real = df_real(params, data)
    _, tangent_imag = df_imag(params, data)

    def loss_prod(grad_conj, d):
        d = d.reshape(d.shape + (1,) * (grad_conj.ndim - d.ndim))
        return jnp.nan_to_num(2 * jnp.nanmean(grad_conj * d, axis=0))

    return jax.tree.map(
        lambda re, im: loss_prod(re - 1j * im, diff), tangent_real, tangent_imag
    )


def test_energy_grad_matches_reference_estimator():
    system, model, params, data = _setup()
    network = model.apply
    loss_fn = make_loss_fn(network, system, LossMode.ENERGY_GRAD)
    stats, grads = jax.jit(loss_fn)(params, data)

    # Rebuild diff exactly as the loss does, then apply the reference estimator.
    diff_fn = make_loss_fn(network, system, LossMode.ENERGY_DIFF)
    _, diff = diff_fn(params, data)
    expected = jax.tree.map(jnp.real, _reference_tangent(network, params, data, diff))

    for ours, ref in zip(jax.tree.leaves(grads), jax.tree.leaves(expected)):
        assert jnp.allclose(ours, ref, atol=1e-5), (ours, ref)


def test_sr_f_vector_matches_reference_estimator():
    system, model, params, data = _setup()
    network = model.apply
    loss_fn = make_loss_fn(network, system, LossMode.SR_F_VECTOR)
    _, tangent = jax.jit(loss_fn)(params, data)
    diff_fn = make_loss_fn(network, system, LossMode.ENERGY_DIFF)
    _, diff = diff_fn(params, data)
    expected = _reference_tangent(network, params, data, diff)
    for ours, ref in zip(jax.tree.leaves(tangent), jax.tree.leaves(expected)):
        assert jnp.allclose(ours, ref, atol=1e-5)


def test_iqr_clip():
    x = jnp.array([0.0, 1.0, 2.0, 3.0, 1000.0]) + 1j * jnp.zeros(5)
    clipped = iqr_clip(x, scale=1.0)
    assert clipped.real[-1] < 1000.0
    assert jnp.allclose(clipped.real[:4], x.real[:4])


def test_stats_fields():
    system, model, params, data = _setup()
    loss_fn = make_loss_fn(model.apply, system, LossMode.ENERGY_DIFF)
    stats, _ = jax.jit(loss_fn)(params, data)
    for key in (
        "energy",
        "variance",
        "kinetic",
        "potential",
        "angular_momentum_z",
        "angular_momentum_z_square",
        "angular_momentum_square",
    ):
        assert key in stats


def test_fused_capture_matches_separate_paths():
    """make_loss_and_capture_fn == (ENERGY_GRAD loss, KFAC tap capture) exactly.

    The fused estimator shares one forward between the weighted gradient VJP
    and the curvature capture; grads must match the standalone loss (the taps
    add zeros) and the tap cotangents must match a standalone capture VJP of
    sqrt(2) * sum Re log psi.
    """
    import numpy as np

    from deephall_tpu.loss import make_loss_and_capture_fn
    from deephall_tpu.networks.blocks import KFAC_TAPS

    system, model, params, data = _setup()
    fused = make_loss_and_capture_fn(system, model)
    stats_f, grads_f, sown, dy = jax.jit(fused)(params, data)

    loss_fn = make_loss_fn(model.apply, system, LossMode.ENERGY_GRAD, model=model)
    stats_s, grads_s = jax.jit(loss_fn)(params, data)
    assert jnp.allclose(stats_f["energy"], stats_s["energy"], atol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads_s)):
        assert jnp.allclose(a, b, atol=1e-5)

    def capture_scalar(taps):
        variables = dict(params)
        variables[KFAC_TAPS] = taps
        out = model.apply(variables, data)
        return jnp.sum(out.real) * np.sqrt(2.0)

    taps_struct = jax.eval_shape(
        lambda p, d: model.apply(dict(p), d, mutable=[KFAC_TAPS])[1][KFAC_TAPS],
        params,
        data,
    )
    taps0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), taps_struct)
    dy_ref = jax.grad(capture_scalar)(taps0)
    for a, b in zip(jax.tree.leaves(dy), jax.tree.leaves(dy_ref)):
        assert jnp.allclose(a, b, atol=1e-5), (a, b)


def test_l2_center_one_sided_gate():
    """k * relu(<L^2> - c): zero gradient below the floor, plain pull above.

    Inside an Lz = m sector every state has L >= m, so with c = m(m+1) the
    gated penalty is identical to the ungated linear selector (the unbiased
    extremal objective) while the cross-sector tunneling direction — the
    instability that bounded k < lz_penalty/2m — gets zero gradient.
    """
    import dataclasses

    system, model, params, data = _setup()
    network = model.apply

    def diff_for(l2_penalty, l2_center, penalties=None):
        sys_i = dataclasses.replace(
            system, l2_penalty=l2_penalty, l2_center=l2_center
        )
        _, diff = make_loss_fn(network, sys_i, LossMode.ENERGY_DIFF)(
            params, data, penalties
        )
        return diff

    base = diff_for(0.0, 0.0)
    legacy = diff_for(0.5, 0.0)
    assert not jnp.allclose(base, legacy)  # the penalty term is active

    # Floor above the batch mean: gate closed, the L^2 term must vanish.
    gated_off = diff_for(0.5, 1e6)
    assert jnp.allclose(gated_off, base, atol=1e-7)

    # Floor below the batch mean: gate open, identical to the c=0 penalty
    # (the center shifts the objective by a constant, never the gradient).
    gated_on = diff_for(0.5, 1e-3)
    assert jnp.allclose(gated_on, legacy, atol=1e-7)

    # Dynamic-operand parity: traced scalars give the static-config result.
    ops = {
        "lz_penalty": jnp.float32(0.0), "lz_center": jnp.float32(0.0),
        "l2_penalty": jnp.float32(0.5), "l2_center": jnp.float32(1e6),
        "overlap_penalty": jnp.float32(0.0),
    }
    assert jnp.allclose(diff_for(0.5, 1e6, ops), gated_off, atol=1e-7)
    ops["l2_center"] = jnp.float32(1e-3)
    assert jnp.allclose(diff_for(0.5, 1e-3, ops), gated_on, atol=1e-7)


def test_l2_adaptive_selector():
    """Deviation-proportional stiffness: k_eff = k clip(<L^2> - c, 0, 1).

    The adaptive selector (``system.l2_adaptive``) must equal the constant
    selector evaluated at the corresponding effective stiffness — with the Lz
    penalty raised in-graph to ``max(lz, 3 lz_center k_eff)`` so the
    instantaneous selector stays inside the cross-sector tunneling window —
    and must vanish (fall back to the nominal Lz penalty) at/below the target
    multiplet.
    """
    import dataclasses

    system, model, params, data = _setup()
    network = model.apply

    def diff_for(adaptive, l2_penalty, l2_center, lz_penalty, penalties=None):
        sys_i = dataclasses.replace(
            system, l2_adaptive=adaptive, l2_penalty=l2_penalty,
            l2_center=l2_center, lz_penalty=lz_penalty, lz_center=2.0,
        )
        stats, diff = make_loss_fn(network, sys_i, LossMode.ENERGY_DIFF)(
            params, data, penalties
        )
        return stats, diff

    # The smooth 8-walker batch has no +-100 IQR outliers, so the clipped
    # batch mean equals the plain nanmean the stats report.
    stats, _ = diff_for(False, 0.0, 0.0, 0.0)
    mean_l2 = float(stats["angular_momentum_square"])

    k, lz = 2.0, 0.1
    # Half a unit above the target: k_eff = k/2, lz_eff = 3 * 2 * k_eff = 6k/2.
    _, adaptive_half = diff_for(True, k, mean_l2 - 0.5, lz)
    k_eff = 0.5 * k
    _, expected_half = diff_for(
        False, k_eff, 1e-3, max(lz, 3.0 * 2.0 * k_eff)
    )
    assert jnp.allclose(adaptive_half, expected_half, atol=1e-6)

    # Far above the target: the deviation clips to 1, full stiffness.
    _, adaptive_full = diff_for(True, k, mean_l2 - 7.0, lz)
    _, expected_full = diff_for(False, k, 1e-3, max(lz, 3.0 * 2.0 * k))
    assert jnp.allclose(adaptive_full, expected_full, atol=1e-6)

    # At/below the target multiplet: the selector vanishes and the Lz penalty
    # returns to its nominal value — the converged measurement is unbiased.
    _, adaptive_off = diff_for(True, k, mean_l2 + 1.0, lz)
    _, expected_off = diff_for(False, 0.0, 0.0, lz)
    assert jnp.allclose(adaptive_off, expected_off, atol=1e-6)

    # Dynamic-operand parity: traced scalars reproduce the static graph.
    ops = {
        "lz_penalty": jnp.float32(lz), "lz_center": jnp.float32(2.0),
        "l2_penalty": jnp.float32(k),
        "l2_center": jnp.float32(mean_l2 - 0.5),
        "overlap_penalty": jnp.float32(0.0),
    }
    _, dyn_half = diff_for(True, k, mean_l2 - 0.5, lz, ops)
    assert jnp.allclose(dyn_half, adaptive_half, atol=1e-6)


def test_stats_nan_resistant_observables():
    """One near-pole walker (NaN local L^2) must not NaN the logged step stats.

    Measured in the sector-penalty runs (runs/roton13): a walker pinned near a
    coordinate pole overflows the 1/tan, 1/sin^2 terms of its local L^2 while
    its energy stays finite; a plain mean then logs a NaN L_square row, which
    poisons any downstream tail average. The logged statistics use nanmean,
    like the energy already did.
    """
    import numpy as np

    from deephall_tpu.loss import stats_and_clipped_diff

    batch = 16
    el = jnp.full((batch,), 6.8, jnp.complex64)
    obs = {
        "angular_momentum_z": jnp.full((batch,), 2.0 + 0j, jnp.complex64),
        "angular_momentum_z_square": jnp.full((batch,), 4.0, jnp.complex64),
        "angular_momentum_square": jnp.full((batch,), 6.0, jnp.complex64)
        .at[3].set(jnp.nan),
        "kinetic": jnp.full((batch,), 3.0, jnp.complex64),
        "potential": jnp.full((batch,), 3.8, jnp.float32),
    }
    stats, diff = stats_and_clipped_diff(System(), el, obs)
    assert np.isfinite(stats["angular_momentum_square"].real)
    assert abs(stats["angular_momentum_square"].real - 6.0) < 1e-6
    assert np.isfinite(stats["energy"].real)

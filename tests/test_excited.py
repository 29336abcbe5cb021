"""Excited-state VMC: overlap-penalty estimator and gradient correctness.

The orthogonality penalty (``loss.orthogonality_stats_and_diff``) is a TPU-side
extension beyond the reference's loss surface (``/root/reference/deephall/
loss.py:76-88`` stops at the Lz / L^2 penalties).  These tests pin

* the estimator itself: self-overlap is exactly 1 with a zero gradient weight,
* the gradient: the covariance-form per-walker weights must reproduce the
  autodiff gradient of the self-normalized reweighted overlap estimator on the
  same fixed samples (explicit ratio dependence + sampling-measure term),
* the plumbing: ``make_loss_fn`` folds the penalty into every mode and the
  ``overlap`` statistic reaches the stats dict.

End-to-end convergence against exact-diagonalization gaps is covered by
``test_excited_end_to_end`` (tiny dim-2 Lz=0 block, N=3 2Q=4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from deephall_tpu.config import Network, System
from deephall_tpu.loss import (
    LossMode,
    fixed_state_log_ratios,
    make_loss_fn,
    orthogonality_stats_and_diff,
    stats_and_clipped_diff,
    vjp_weights,
)
from deephall_tpu.networks import make_network


def _setup(batch=16, seed=0):
    system = System(flux=2, nspins=(3, 0), interaction_strength=0.0)
    net = Network()
    net.psiformer.num_layers = 1
    net.psiformer.num_heads = 1
    net.psiformer.heads_dim = 4
    model = make_network(system, net)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    theta = jnp.arccos(jax.random.uniform(k1, (batch, 3), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (batch, 3), minval=-jnp.pi, maxval=jnp.pi)
    data = jnp.stack([theta, phi], axis=-1)
    params = model.init(k3, data[0])
    params_phi = model.init(k4, data[0])
    return system, model, params, params_phi, data


def test_self_overlap_is_one_with_zero_gradient():
    """phi == psi: O = 1 exactly and every per-walker weight vanishes."""
    system, model, params, _, data = _setup()
    logpsi = model.apply(params, data)
    log_ratios = fixed_state_log_ratios([lambda d: model.apply(params, d)], logpsi, data)
    overlap, diff = orthogonality_stats_and_diff(log_ratios, penalty=2.5)
    np.testing.assert_allclose(overlap, 1.0, atol=1e-6)
    np.testing.assert_allclose(diff, 0.0, atol=1e-6)


def test_gradient_matches_reweighted_autodiff():
    """Covariance weights == autodiff of the reweighted overlap on fixed samples.

    With walkers frozen, the self-normalized importance-sampling estimator
    ``O(theta) = |sum_i u_i rho_i|^2 / sum_i u_i |rho_i|^2`` with
    ``u_i = softmax(2 Re log psi_theta)`` is a differentiable function of the
    parameters whose gradient at the sampling point is the exact estimator
    gradient (explicit + measure terms).  The analytic per-walker weights must
    reproduce it to numerical precision.
    """
    system, model, params, params_phi, data = _setup()
    logphi = jax.lax.stop_gradient(model.apply(params_phi, data))
    logpsi0 = jax.lax.stop_gradient(model.apply(params, data))

    def overlap_reweighted(p):
        logpsi = model.apply(p, data)
        # Weights relative to the sampling density |psi_theta0|^2: uniform at
        # theta0, where the samples (by assumption) came from.
        u = jax.nn.softmax(2.0 * (logpsi.real - logpsi0.real))
        rho = jnp.exp(logphi - logpsi)
        r = jnp.sum(u * rho)
        n = jnp.sum(u * jnp.abs(rho) ** 2)
        return jnp.abs(r) ** 2 / n

    grad_true = jax.grad(overlap_reweighted)(params)

    logpsi = model.apply(params, data)
    log_ratios = fixed_state_log_ratios([lambda d: model.apply(params_phi, d)], logpsi, data)
    _, diff = orthogonality_stats_and_diff(log_ratios, penalty=1.0)
    w = vjp_weights(diff)

    def weighted(p):
        lp = model.apply(p, data)
        return jnp.sum(lp.real * w.real + lp.imag * w.imag)

    grad_est = jax.grad(weighted)(params)
    for ours, true in zip(jax.tree.leaves(grad_est), jax.tree.leaves(grad_true)):
        np.testing.assert_allclose(ours, true, atol=1e-6)


def test_penalty_folds_into_energy_grad_and_stats():
    """make_loss_fn(fixed_states=...) == unpenalized grad + penalty grad."""
    system, model, params, params_phi, data = _setup()
    network = model.apply
    fixed = [lambda d: model.apply(params_phi, d)]

    stats_pen, grads_pen = jax.jit(
        make_loss_fn(network, system, LossMode.ENERGY_GRAD, fixed_states=fixed)
    )(params, data)
    stats_plain, grads_plain = jax.jit(
        make_loss_fn(network, system, LossMode.ENERGY_GRAD)
    )(params, data)

    assert "overlap" in stats_pen and "overlap" not in stats_plain
    assert 0.0 < float(stats_pen["overlap"]) < 1.0
    np.testing.assert_allclose(stats_pen["energy"], stats_plain["energy"], atol=1e-6)

    # Penalty-only gradient, assembled independently of the loss plumbing.
    logpsi = network(params, data)
    log_ratios = fixed_state_log_ratios(fixed, logpsi, data)
    _, pdiff = orthogonality_stats_and_diff(log_ratios, system.overlap_penalty)
    w = vjp_weights(pdiff)

    def weighted(p):
        lp = network(p, data)
        return jnp.sum(lp.real * w.real + lp.imag * w.imag)

    grad_pen_only = jax.grad(weighted)(params)
    for tot, plain, pen in zip(
        jax.tree.leaves(grads_pen),
        jax.tree.leaves(grads_plain),
        jax.tree.leaves(grad_pen_only),
    ):
        np.testing.assert_allclose(tot, plain + pen, atol=2e-5)


def _tail_mean(csv_path, column, rows=100):
    import csv

    with open(csv_path) as f:
        table = list(csv.DictReader(f))
    return float(np.mean([float(r[column]) for r in table[-rows:]]))


def test_excited_state_end_to_end(tmp_path):
    """Full excited-state workflow against the exact-diagonalization oracle.

    N=3, 2Q=4, Lz=0 is a dim-2 LLL block (``observables.ed``): an L=1 ground
    multiplet at E=2.96098 and an L=3 excited multiplet at E=3.12266 (total
    energies, interaction_strength=1).  Phase 1 trains the ground state with
    the Lz penalty pinning the Lz=0 member (plus the L^2 penalty, which is
    bias-free here because the ground state is also the minimal-L^2 state).
    Phase 2 re-trains from scratch with an overlap penalty against the saved
    phase-1 checkpoint: the only remaining Lz=0 state is the L=3 member, so
    the run must land at the *excited* energy with L^2 ~= 12 and vanishing
    overlap.  VMC sits a few times 1e-2 *below* the LLL anchors via Landau-level
    mixing (same direction as every converged family in BASELINE.md).
    """
    from deephall_tpu.observables import ed
    from deephall_tpu.train import cli

    block = ed.ed_block(3, 4, two_lz=0)
    assert block.dim == 2
    e0 = block.total_energy(3)  # 2.96098, L^2 = 2
    e1 = e0 + float(block.energies[1] - block.energies[0])  # 3.12266, L^2 = 12

    common = [
        "batch_size=256",
        "system.nspins=[3, 0]",
        "system.flux=4",
        "system.lz_penalty=1.0",
        "network.psiformer.num_layers=1",
        "network.psiformer.num_heads=1",
        "network.psiformer.heads_dim=8",
        "mcmc.burn_in=30",
        "optim.iterations=500",
        "optim.optimizer=kfac",
    ]
    ground_dir = tmp_path / "ground"
    cli([*common, "seed=7", "system.l2_penalty=0.5", f"log.save_path={ground_dir}"])
    stats = ground_dir / "train_stats.csv"
    ground_energy = _tail_mean(stats, "energy")
    assert abs(ground_energy - e0) < 0.06, (ground_energy, e0)
    assert _tail_mean(stats, "L_square") < 3.0

    excited_dir = tmp_path / "excited"
    cli(
        [
            *common,
            "seed=11",
            f"system.orthogonal_states=[{ground_dir}/ckpt_000499.npz]",
            "system.overlap_penalty=1.0",
            f"log.save_path={excited_dir}",
        ]
    )
    stats = excited_dir / "train_stats.csv"
    excited_energy = _tail_mean(stats, "energy")
    assert abs(excited_energy - e1) < 0.08, (excited_energy, e1)
    assert _tail_mean(stats, "L_square") > 10.0
    assert _tail_mean(stats, "overlap") < 0.1
    assert excited_energy - ground_energy > 0.08  # exact gap: 0.162


def test_overlap_penalty_device_count_invariant():
    """Penalty gradients/stats are identical on 1 vs 8 devices.

    The overlap estimator's batch means must be *global* means over the walker
    mesh (XLA inserts the collectives); any per-shard normalization bug would
    show as a device-count-dependent gradient.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deephall_tpu import parallel

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    system, model, params, params_phi, data = _setup(batch=16)
    fixed = [lambda d: model.apply(params_phi, d)]
    loss_fn = make_loss_fn(
        model.apply, system, LossMode.ENERGY_GRAD, fixed_states=fixed
    )

    def run(n_devices):
        mesh = parallel.get_mesh(jax.devices()[:n_devices])
        sharded = jax.device_put(data, NamedSharding(mesh, P(parallel.DATA_AXIS)))
        p = jax.device_put(params, NamedSharding(mesh, P()))
        stats, grads = jax.jit(loss_fn)(p, sharded)
        return float(stats["overlap"]), jax.device_get(grads)

    o1, g1 = run(1)
    o8, g8 = run(8)
    assert abs(o1 - o8) < 1e-6
    # atol matches test_sharding's: f32 reduction-order noise is ~1e-5 even for
    # the unpenalized loss; a per-shard normalization bug would be O(1).
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_overlap_stat_via_stats_and_clipped_diff():
    system, model, params, params_phi, data = _setup()
    el = jnp.zeros(data.shape[0], jnp.complex64)
    obs = {
        "angular_momentum_z": jnp.zeros(data.shape[0]),
        "angular_momentum_z_square": jnp.zeros(data.shape[0]),
        "angular_momentum_square": jnp.zeros(data.shape[0]),
        "kinetic": jnp.zeros(data.shape[0], jnp.complex64),
        "potential": jnp.zeros(data.shape[0]),
    }
    logpsi = model.apply(params, data)
    ratios = fixed_state_log_ratios([lambda d: model.apply(params_phi, d)], logpsi, data)
    stats, diff = stats_and_clipped_diff(system, el, obs, ratios)
    assert "overlap" in stats
    # The folded penalty weights are mean-zero by construction: sum(diff) ~ 0.
    np.testing.assert_allclose(jnp.nanmean(diff), 0.0, atol=1e-6)

"""VMC training driver and CLI.

Loop parity with the reference driver (``/root/reference/deephall/train.py:80-167``):
uniform walker init on the sphere, burn-in, optional initial-energy probe, and per
iteration MCMC -> width adaptation -> optimizer step -> CSV log -> checkpoint on
(time AND step-multiple) OR NaN OR last step OR SIGTERM, with a graceful-kill latch.

TPU-first execution model: there is no pmap and no leading device axis.  One global
1-D mesh spans every chip; the walker batch is a single ``[batch, nelec, 2]`` array
sharded over the mesh, parameters/width are replicated by sharding spec, and exactly
two jitted functions run per iteration (the MCMC step and the training step), both
donating their inputs.  All cross-chip reductions are XLA-inserted all-reduces over
ICI from plain global means.  Complex statistics are split into (real, imag) pairs
inside jit because complex arrays cannot cross the host boundary on this TPU runtime.

Matmul precision is pinned to ``highest`` (3-pass f32 on the MXU): local energies are
second derivatives of the network and bf16 matmul error is visible in the physics.
"""

from __future__ import annotations

import logging
import os
import signal
import sys
import time
from argparse import ArgumentParser

import jax
import numpy as np
import yaml
from jax import numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deephall_tpu import mcmc, optimizers, parallel
from deephall_tpu.config import (
    Config,
    OptimizerName,
    dotlist_to_dict,
    merge_dicts,
    resolve_interpolations,
    to_dict,
)
from deephall_tpu.log import CheckpointState, LogManager, init_logging
from deephall_tpu.loss import LossMode, make_loss_fn
from deephall_tpu.networks import blocks, make_network
from deephall_tpu.utils import pack_complex, setup_runtime, unpack_complex

logger = logging.getLogger("deephall")


def init_guess(key, batch: int, nelec: int) -> jnp.ndarray:
    """Uniform samples on the sphere: ``[batch, nelec, 2]`` (theta, phi)."""
    key1, key2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(key1, (batch, nelec), minval=-1, maxval=1))
    phi = jax.random.uniform(key2, (batch, nelec), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


def load_fixed_states(cfg: Config):
    """Load ``system.orthogonal_states`` checkpoints as batched ``log phi`` callables.

    Excited-state VMC: each checkpoint (with its ``config.yml`` sidecar) is a
    converged lower state to orthogonalize against via overlap penalties
    (``loss.orthogonality_stats_and_diff``).  The fixed parameters are closed
    over as jit constants — replicated onto every device by XLA, never updated.

    Raises:
        ValueError: if a fixed state was trained on a different physical
            system (flux / electron count / radius), where the overlap
            estimator would silently compare wavefunctions on different
            geometries.
    """
    if not cfg.system.orthogonal_states:
        return None
    from deephall_tpu.observables.runner import load_run

    fixed = []
    for path in cfg.system.orthogonal_states:
        fcfg, fmodel, fparams, _, _ = load_run(path)
        same_system = (
            fcfg.system.flux == cfg.system.flux
            and tuple(fcfg.system.nspins) == tuple(cfg.system.nspins)
            and fcfg.system.radius == cfg.system.radius
        )
        if not same_system:
            raise ValueError(
                f"orthogonal state {path} was trained on a different system "
                f"(flux={fcfg.system.flux}, nspins={fcfg.system.nspins}, "
                f"radius={fcfg.system.radius})"
            )
        fixed.append(lambda d, m=fmodel, p=fparams: m.apply(p, d))
        logger.info("Orthogonality penalty against %s", path)
    return fixed


_TRANSIENT_MARKERS = ("UNAVAILABLE", "Connection", "transport", "remote_compile")
_TRANSIENT_RETRIES = 15
_TRANSIENT_BACKOFF_S = 120.0


def _run_block_resilient(iteration_block, state, key, pmoves, t, length, *,
                         log_manager, adapt, step, penalties=None):
    """Run one fused block, riding out transient tunnel/compile-service outages.

    On this runtime the remote compile service restarts independently of the
    device: a mid-run recompile (e.g. the layout-driven block-2 compile, see
    ``make_iteration_block``) can then fail with a transport error while the
    device state and cached executables remain perfectly healthy. Observed in
    production (runs/prod_jain37: block 2 died on "remote_compile: Connection
    refused" after a clean block 1). Retry with a flat backoff; on the first
    failure, best-effort checkpoint the still-readable device state so even a
    permanent outage costs at most one block.

    Scope: this protects against *compile-phase* failures, which raise before
    the block executes — the donated input buffers are still alive, so both the
    checkpoint and the retry are sound. An execution-phase failure may have
    consumed the donation; that case is detected and re-raised immediately.
    The checkpoint is single-process only: ``save_checkpoint`` gathers sharded
    data with a cross-process collective, and issuing one from a per-process
    exception handler while peers are still inside the block's collectives
    would desync a multi-host run.
    """
    saved = False
    for attempt in range(_TRANSIENT_RETRIES + 1):
        try:
            return iteration_block(state, key, pmoves, t, length, penalties)
        except jax.errors.JaxRuntimeError as e:  # noqa: PERF203
            msg = str(e)
            transient = any(m in msg for m in _TRANSIENT_MARKERS)
            donated = any(
                getattr(x, "is_deleted", lambda: False)()
                for x in jax.tree.leaves((state, key, pmoves, t))
            )
            if not transient or donated or attempt == _TRANSIENT_RETRIES:
                if donated:
                    logger.error(
                        "Transient runtime error arrived after the block consumed "
                        "its donated inputs; cannot retry: %s", msg.splitlines()[0]
                    )
                raise
            logger.warning(
                "Transient runtime error in iteration block (attempt %d/%d): %s",
                attempt + 1, _TRANSIENT_RETRIES, msg.splitlines()[0],
            )
            if not saved and step > 0 and jax.process_count() == 1:
                saved = True
                try:  # readback uses only cached transfer paths
                    log_manager.save_checkpoint(step - 1, state, adapt=adapt)
                    logger.warning("Best-effort checkpoint saved before retrying")
                except Exception as save_err:  # noqa: BLE001
                    logger.warning("Best-effort checkpoint failed: %s", save_err)
            time.sleep(_TRANSIENT_BACKOFF_S)


def make_iteration_block(cfg: Config, mcmc_step_fn, training_step):
    """Build the fused per-iteration device program.

    One iteration = MCMC sweep -> in-graph adaptive-width update -> optimizer step.
    ``lax.scan`` fuses ``length`` iterations into a single dispatch so the host
    round-trip (tens of ms on tunnelled TPU runtimes) is paid once per block, and the
    proposal-width adaptation runs entirely on device (ring buffer in the scan carry,
    same thresholds/semantics as the reference's host-side
    ``update_mcmc_width``, ``mcmc.py:153-186``).

    Returns:
        ``block(state, key, pmoves, t, length, penalties=None)`` — jit-compiled
        per distinct ``length`` — returning ``(state, key, pmoves, t,
        (stats, pmove))`` with per-iteration statistics stacked along the
        leading axis.  ``penalties`` is the optional dynamic-penalty operand
        dict (``system.dynamic_penalties``): it enters the compiled program as
        traced scalars, so successive launches with different penalty values
        (penalty sweeps, the per-sector magnetoroton runs) reuse one
        executable.
    """
    adapt = cfg.mcmc.adapt_frequency

    def make_body(penalties):
        def body(carry, _):
            state, key, pmoves, t = carry
            key, k_mcmc, k_opt = jax.random.split(key, 3)
            new_data, pmove = mcmc_step_fn(
                state.params, state.data, k_mcmc, state.mcmc_width
            )
            idx = t % adapt
            pmoves = pmoves.at[idx].set(pmove)
            do_update = (t > 0) & (idx == 0)
            mean_pmove = jnp.mean(pmoves)
            width = state.mcmc_width
            width = jnp.where(do_update & (mean_pmove > 0.55), width * 1.1, width)
            width = jnp.where(do_update & (mean_pmove < 0.5), width / 1.1, width)
            state = state._replace(data=new_data, mcmc_width=width)
            state, stats = (
                training_step(state, k_opt, penalties)
                if penalties
                else training_step(state, k_opt)
            )
            return (state, key, pmoves, t + 1), (pack_complex(stats), pmove)

        return body

    compiled: dict[int, object] = {}

    def block(state, key, pmoves, t, length: int, penalties=None):
        # NOTE: blocks 1 and 2 may compile *different* executables for the same
        # length — donated outputs can come back with different layouts than
        # the freshly device_put inputs, and jit keys on input layouts. Both
        # land in the persistent compilation cache, so only fresh configs pay
        # twice.
        if length not in compiled:

            def run(state, key, pmoves, t, penalties):
                (state, key, pmoves, t), outs = jax.lax.scan(
                    make_body(penalties), (state, key, pmoves, t), length=length
                )
                return state, key, pmoves, t, outs

            compiled[length] = jax.jit(run, donate_argnums=(0,))
        return compiled[length](state, key, pmoves, t, penalties or {})

    return block


def make_sweep_network(batched_apply):
    """The MCMC sweep's network, honoring the sampler knobs.

    ``DEEPHALL_MCMC_NETWORK``: "vmap" (default) wraps the per-config network —
    inside the fused iteration block XLA schedules it measurably better than
    the batched apply (the loss/KFAC paths stay natively batched, where
    batching wins). "batched" feeds the batched apply to the sweep instead —
    with ``DEEPHALL_ATTENTION_IMPL=bm/auto`` that routes the sweep's 10
    forwards through the lane-filling batch-minor attention, which the vmapped
    per-config network can never trigger (it traces at ndim=2).

    ``DEEPHALL_MCMC_DTYPE``: sampler precision, default ``bf16`` (reduced
    precision, +12.8%/+11.3% end-to-end — PERF_NOTES round 4; ``f32`` restores
    the full-precision sweep).  The sweep's forwards run their feature tower
    in bfloat16.  They do NOT feed the local energy (the precision invariant
    boundary, CLAUDE.md; only the sampled *positions* do), and a deterministic
    reduced-precision ``log|psi~|`` keeps Metropolis detailed balance exact
    for ``|psi~|^2``.  Physics validated on the converged N=6 production
    state: f32-vs-bf16 inference tails agree (BASELINE.md round 4).  The
    context manager is entered inside the traced function so the reduced
    tower applies exactly where this wrapper is traced and nowhere else
    (loss/KFAC stay f32).

    Shared by the training driver and ``bench.py`` so the benchmark always
    constructs the identical sweep program.
    """
    if os.environ.get("DEEPHALL_MCMC_NETWORK", "vmap") == "batched":
        net = batched_apply
    else:
        net = jax.vmap(batched_apply, in_axes=(None, 0))
    if os.environ.get("DEEPHALL_MCMC_DTYPE", "bf16") in ("bf16", "bfloat16"):
        _full_precision_network = net

        def net(params, x):
            with blocks.tower_dtype(jnp.bfloat16):
                return _full_precision_network(params, x)

    return net


def train(cfg: Config) -> None:
    """Run the full VMC training loop for the given configuration."""
    setup_runtime()
    init_logging()
    parallel.initialize_distributed()  # before LogManager: it queries process rank
    # All processes restore state through the LogManager, but only process 0 owns
    # the run directory: CSV stats and checkpoint writes would collide on a shared
    # filesystem otherwise (the reference is single-process and never hits this).
    is_main_process = jax.process_index() == 0
    log_manager = LogManager(cfg, write_artifacts=is_main_process)
    mesh = parallel.get_mesh()
    n_devices = len(mesh.devices.flatten())
    if cfg.batch_size % n_devices:
        raise ValueError(
            f"batch_size={cfg.batch_size} must be divisible by {n_devices} devices"
        )
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    rep_sharding = NamedSharding(mesh, P())

    nelec = sum(cfg.system.nspins)
    model = make_network(cfg.system, cfg.network)
    network = model.apply  # natively batched: accepts [batch, nelec, 2] directly
    # The MCMC sweep network honors the sampler knobs (vmap/batched layout and
    # the reduced-precision bf16 tower) — see make_sweep_network.
    mcmc_network = make_sweep_network(network)

    sample_config = jnp.zeros((nelec, 2))
    mcmc_step_fn = mcmc.make_mcmc_step(mcmc_network, steps=cfg.mcmc.steps)
    mcmc_step = jax.jit(mcmc_step_fn, donate_argnums=(1,))
    fixed_states = load_fixed_states(cfg)
    opt_init, training_step = optimizers.make_optimizer_step(
        cfg, model, sample_config, fixed_states=fixed_states
    )
    iteration_block = make_iteration_block(cfg, mcmc_step_fn, training_step)
    energy_probe = jax.jit(
        lambda params, data: pack_complex(
            make_loss_fn(
                network,
                cfg.system,
                LossMode.ENERGY_DIFF,
                model=model,
                fixed_states=fixed_states,
            )(params, data)[0]
        )
    )

    key = jax.random.PRNGKey(cfg.seed)
    restored = log_manager.try_restore_checkpoint()
    adapt_restored: dict = {}
    if restored is not None:
        initial_step, (params, data, opt_state, mcmc_width), adapt_restored = restored
        opt_state = optimizers.validate_opt_state(cfg, opt_state)
        params = jax.device_put(params, rep_sharding)
        data = jax.device_put(jnp.asarray(data), data_sharding)
        if opt_state is not None:
            opt_state = jax.device_put(opt_state, rep_sharding)
        mcmc_width = jax.device_put(jnp.asarray(mcmc_width), rep_sharding)
    else:
        key, key_data, key_params = jax.random.split(key, 3)
        initial_step = 0
        data = jax.device_put(
            init_guess(key_data, cfg.batch_size, nelec), data_sharding
        )
        params = jax.device_put(
            jax.jit(model.init)(key_params, sample_config), rep_sharding
        )
        opt_state = None
        mcmc_width = jax.device_put(jnp.asarray(cfg.mcmc.width), rep_sharding)

    if (
        cfg.optim.optimizer == OptimizerName.none
        and cfg.log.restore_path is not None
        and cfg.log.restore_path != cfg.log.save_path
    ):  # Inference on a restored run is a fresh run: reset the step counter.
        initial_step = 0

    if opt_state is None:
        key, subkey = jax.random.split(key)
        opt_state = jax.jit(opt_init)(params, subkey, data)

    logger.info("Start VMC with %s JAX devices", n_devices)

    if initial_step == 0:
        for _ in range(cfg.mcmc.burn_in):
            key, subkey = jax.random.split(key)
            data, pmove = mcmc_step(params, data, subkey, mcmc_width)
        logger.info("Burn in MCMC complete")
        if cfg.log.initial_energy:
            # If the initial energy is fine but training then breaks, suspect the
            # optimizer (reference train.py:112-118).
            initial_stats = unpack_complex(jax.device_get(energy_probe(params, data)))
            logger.info("Initial energy: %s", initial_stats["energy"].real)

    # Dynamic-penalty operands (system.dynamic_penalties): replicated device
    # scalars passed into the fused block each launch, so sector/penalty sweeps
    # with different values reuse one compiled executable instead of paying a
    # fresh remote compile per value.
    penalty_operands = None
    if cfg.system.dynamic_penalties:
        penalty_operands = jax.device_put(
            {
                "lz_penalty": jnp.asarray(cfg.system.lz_penalty, jnp.float32),
                "lz_center": jnp.asarray(cfg.system.lz_center, jnp.float32),
                "l2_penalty": jnp.asarray(cfg.system.l2_penalty, jnp.float32),
                "l2_center": jnp.asarray(cfg.system.l2_center, jnp.float32),
                "overlap_penalty": jnp.asarray(
                    cfg.system.overlap_penalty, jnp.float32
                ),
            },
            rep_sharding,
        )

    state = CheckpointState(params, data, opt_state, mcmc_width)
    # Width-adaptation state (pmoves ring + step counter) survives a save/restore
    # boundary so a resumed run reproduces the uninterrupted width trajectory.
    # Reference checkpoints carry no such keys and start a fresh ring, which is the
    # reference's own resume behaviour (train.py:131 passes step - initial_step).
    pmoves0 = adapt_restored.get("pmoves")
    if pmoves0 is None or pmoves0.shape != (cfg.mcmc.adapt_frequency,):
        pmoves0 = jnp.zeros(cfg.mcmc.adapt_frequency)
    t0 = jnp.asarray(adapt_restored.get("t", 0), jnp.int32).reshape(())
    pmoves_dev = jax.device_put(jnp.asarray(pmoves0), rep_sharding)
    t_dev = jax.device_put(t0, rep_sharding)

    last_save_time = time.time()
    killer = GracefulKiller()
    profiling = False
    block_size = max(1, cfg.optim.block_size)
    with log_manager.create_writer() as writer:
        writer.hide("kinetic", "potential", "Lz_square", "step_time")
        step = initial_step
        while step < cfg.optim.iterations:
            length = min(block_size, cfg.optim.iterations - step)
            if cfg.log.profile_dir is not None:
                rel = step - initial_step
                if not profiling and rel + length > cfg.log.profile_start:
                    jax.profiler.start_trace(cfg.log.profile_dir)
                    profiling = True
                elif (
                    profiling
                    and rel >= cfg.log.profile_start + cfg.log.profile_steps
                ):
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("Saved profiler trace to %s", cfg.log.profile_dir)
            block_start = time.perf_counter()
            state, key, pmoves_dev, t_dev, (packed_stats, pmove) = _run_block_resilient(
                iteration_block, state, key, pmoves_dev, t_dev, length,
                log_manager=log_manager,
                adapt={"pmoves": pmoves_dev, "t": t_dev},
                step=step,
                penalties=penalty_operands,
            )
            all_stats = unpack_complex(jax.device_get(packed_stats))
            pmove_host = np.asarray(jax.device_get(pmove))
            step_time = (time.perf_counter() - block_start) / length
            for i in range(length):
                stats = jax.tree.map(lambda x: x[i], all_stats)
                extra = {}
                if "overlap" in stats:  # excited-state runs: sum_j O_j -> 0
                    extra["overlap"] = f"{stats['overlap']:.4f}"
                writer.log(
                    step=str(step + i),
                    pmove=f"{pmove_host[i]:.2f}",
                    energy=f"{stats['energy'].real:.4f}",
                    energy_imag=f"{stats['energy'].imag:+.4f}",
                    potential=f"{stats['potential']:.4f}",
                    kinetic=f"{stats['kinetic'].real:.4f}",
                    variance=f"{stats['variance']:.4f}",
                    Lz=f"{stats['angular_momentum_z']:+.4f}",
                    Lz_square=f"{stats['angular_momentum_z_square']:.4f}",
                    L_square=f"{stats['angular_momentum_square']:.4f}",
                    step_time=f"{step_time:.4f}",
                    **extra,
                )
            step += length
            energy_is_nan = bool(np.isnan(all_stats["energy"].real).any())
            current_time = time.time()
            if (
                (
                    current_time - last_save_time > cfg.log.save_time_interval
                    and step % cfg.log.save_step_interval == 0
                )
                or energy_is_nan
                or step >= cfg.optim.iterations
                or killer.kill_now
            ):
                last_save_time = current_time
                writer.force_flush()
                log_manager.save_checkpoint(
                    step - 1, state, adapt={"pmoves": pmoves_dev, "t": t_dev}
                )
            if killer.kill_now or energy_is_nan:
                if profiling:
                    jax.profiler.stop_trace()
                raise SystemExit("=" * 30 + " ABORT " + "=" * 30)
        if profiling:
            jax.profiler.stop_trace()


class GracefulKiller:
    """Capture SIGINT/SIGTERM so a checkpoint is saved before exiting."""

    kill_now = False

    def __init__(self):
        self.original_int = signal.signal(signal.SIGINT, self.exit_gracefully)
        self.original_term = signal.signal(signal.SIGTERM, self.exit_gracefully)

    def exit_gracefully(self, signum, frame):
        """Latch the exit request; a second signal falls through to the original."""
        del signum, frame
        if self.kill_now:
            return
        print("\r", end="")  # Clear ^C
        signal.signal(signal.SIGINT, self.original_int)
        signal.signal(signal.SIGTERM, self.original_term)
        self.kill_now = True


def cli(argv: list[str] | None = None) -> None:
    """Command line entry: ``deephall-tpu key=value ... [--yml file]``."""
    parser = ArgumentParser(
        prog="deephall-tpu",
        description="Simulating the fractional quantum Hall effect (FQHE) with "
        "neural network variational Monte Carlo on TPU.",
    )
    parser.add_argument(
        "dotlist", help="path.to.key=value pairs for configuration", nargs="*"
    )
    parser.add_argument("--yml", help="config YML file to merge")
    args = parser.parse_args(argv or sys.argv[1:] or ["--help"])

    config = to_dict(Config())
    if args.yml:
        with open(args.yml, encoding="utf8") as f:
            config = merge_dicts(config, yaml.safe_load(f) or {})
    config = merge_dicts(config, dotlist_to_dict(args.dotlist))
    config = resolve_interpolations(config)
    train(Config.from_dict(config))


if __name__ == "__main__":
    cli()

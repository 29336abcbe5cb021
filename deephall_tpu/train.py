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
    to_dict,
)
from deephall_tpu.log import CheckpointState, LogManager, init_logging
from deephall_tpu.loss import LossMode, make_loss_fn
from deephall_tpu.networks import make_network
from deephall_tpu.utils import pack_complex, unpack_complex

logger = logging.getLogger("deephall")


def init_guess(key, batch: int, nelec: int) -> jnp.ndarray:
    """Uniform samples on the sphere: ``[batch, nelec, 2]`` (theta, phi)."""
    key1, key2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(key1, (batch, nelec), minval=-1, maxval=1))
    phi = jax.random.uniform(key2, (batch, nelec), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


def train(cfg: Config) -> None:
    """Run the full VMC training loop for the given configuration."""
    jax.config.update("jax_default_matmul_precision", "highest")
    init_logging()
    log_manager = LogManager(cfg)
    parallel.initialize_distributed()
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
    network = model.apply
    batch_network = jax.vmap(network, in_axes=(None, 0))

    sample_config = jnp.zeros((nelec, 2))
    mcmc_step = jax.jit(
        mcmc.make_mcmc_step(batch_network, steps=cfg.mcmc.steps),
        donate_argnums=(1,),
    )
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample_config)

    def training_step_packed(state, key):
        new_state, stats = training_step(state, key)
        return new_state, pack_complex(stats)

    jit_training_step = jax.jit(training_step_packed, donate_argnums=(0,))
    energy_probe = jax.jit(
        lambda params, data: pack_complex(
            make_loss_fn(network, cfg.system, LossMode.ENERGY_DIFF)(params, data)[0]
        )
    )

    key = jax.random.PRNGKey(cfg.seed)
    restored = log_manager.try_restore_checkpoint()
    if restored is not None:
        initial_step, (params, data, opt_state, mcmc_width) = restored
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

    pmoves = np.zeros(cfg.mcmc.adapt_frequency)
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

    state = CheckpointState(params, data, opt_state, mcmc_width)

    last_save_time = time.time()
    killer = GracefulKiller()
    with log_manager.create_writer() as writer:
        writer.hide("kinetic", "potential", "Lz_square")
        for step in range(initial_step, cfg.optim.iterations):
            key, subkey = jax.random.split(key)
            new_data, pmove = mcmc_step(
                state.params, state.data, subkey, state.mcmc_width
            )
            new_mcmc_width, pmoves = mcmc.update_mcmc_width(
                step - initial_step,
                state.mcmc_width,
                cfg.mcmc.adapt_frequency,
                pmove,
                pmoves,
            )
            state = state._replace(data=new_data, mcmc_width=new_mcmc_width)
            key, subkey = jax.random.split(key)
            state, packed_stats = jit_training_step(state, subkey)
            stats = unpack_complex(jax.device_get(packed_stats))
            writer.log(
                step=str(step),
                pmove=f"{float(jax.device_get(pmove)):.2f}",
                energy=f"{stats['energy'].real:.4f}",
                energy_imag=f"{stats['energy'].imag:+.4f}",
                potential=f"{stats['potential']:.4f}",
                kinetic=f"{stats['kinetic'].real:.4f}",
                variance=f"{stats['variance']:.4f}",
                Lz=f"{stats['angular_momentum_z']:+.4f}",
                Lz_square=f"{stats['angular_momentum_z_square']:.4f}",
                L_square=f"{stats['angular_momentum_square']:.4f}",
            )
            energy_is_nan = np.isnan(stats["energy"].real)
            current_time = time.time()
            if (
                (
                    current_time - last_save_time > cfg.log.save_time_interval
                    and (step + 1) % cfg.log.save_step_interval == 0
                )
                or energy_is_nan
                or step == cfg.optim.iterations - 1
                or killer.kill_now
            ):
                last_save_time = current_time
                writer.force_flush()
                log_manager.save_checkpoint(step, state)
            if killer.kill_now or energy_is_nan:
                raise SystemExit("=" * 30 + " ABORT " + "=" * 30)


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
    train(Config.from_dict(config))


if __name__ == "__main__":
    cli()

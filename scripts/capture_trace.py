"""Capture a jax.profiler trace of steady-state fused production blocks.

Builds the same fused iteration block as ``bench.py`` (N=6, 2Q=15, batch 3360,
KFAC, 10 MCMC steps/iter), warms up through the compile, then traces a few
blocks. The trace lands in ``--out`` as TensorBoard ``*.xplane.pb`` files;
summarise with ``scripts/trace_summary.py``.

    python scripts/capture_trace.py --out runs/trace_r3 [--l2] [--blocks 2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--l2", action="store_true", help="L2-every-step mode")
    parser.add_argument("--blocks", type=int, default=2)
    args = parser.parse_args()

    from bench import BLOCK, measure  # noqa: F401  (shares setup path)
    from deephall_tpu.utils import setup_runtime

    setup_runtime()

    # Re-create the bench setup inline so we control when the trace starts.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deephall_tpu import optimizers, parallel
    from deephall_tpu.config import Config
    from deephall_tpu.mcmc import make_mcmc_step
    from deephall_tpu.networks import make_network
    from deephall_tpu.train import init_guess, make_iteration_block
    from deephall_tpu.types import CheckpointState

    cfg = Config()
    cfg.seed = 42
    cfg.system.nspins = (6, 0)
    cfg.system.flux = 15
    cfg.system.compute_l2 = args.l2
    cfg.batch_size = 3360
    cfg.optim.optimizer = "kfac"
    cfg.optim.block_size = BLOCK

    mesh = parallel.get_mesh()
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    rep_sharding = NamedSharding(mesh, P())
    nelec = sum(cfg.system.nspins)
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((nelec, 2))
    params = jax.device_put(
        jax.jit(model.init)(jax.random.PRNGKey(0), sample), rep_sharding
    )
    data = jax.device_put(
        init_guess(jax.random.PRNGKey(1), cfg.batch_size, nelec), data_sharding
    )
    width = jax.device_put(jnp.asarray(cfg.mcmc.width), rep_sharding)
    mcmc_step_fn = make_mcmc_step(
        jax.vmap(model.apply, in_axes=(None, 0)), steps=cfg.mcmc.steps
    )
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(2), data)
    block = make_iteration_block(cfg, mcmc_step_fn, training_step)
    state = CheckpointState(params, data, opt_state, width)
    key = jax.random.PRNGKey(3)
    pmoves = jax.device_put(jnp.zeros(cfg.mcmc.adapt_frequency), rep_sharding)
    t = jax.device_put(jnp.zeros((), jnp.int32), rep_sharding)

    for _ in range(2):  # compile both input-sharding signatures
        state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
    float(jax.device_get(outs[0]["energy"].real[-1]))

    jax.profiler.start_trace(args.out)
    for _ in range(args.blocks):
        state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
    float(jax.device_get(outs[0]["energy"].real[-1]))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} ({args.blocks} blocks of {BLOCK})")


if __name__ == "__main__":
    main()

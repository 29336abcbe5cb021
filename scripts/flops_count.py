"""XLA cost-analysis FLOP count of the production fused block (CPU lowering).

Builds the same fused iteration block as ``bench.py`` / ``scripts/capture_trace.py``
(N=6, 2Q=15, batch 3360, KFAC, 10 MCMC steps/iter) on the CPU backend and prints
XLA's analytical FLOP/byte estimates per VMC iteration. Used together with the
device-time trace (``scripts/trace_summary.py``) to compute a measured MFU:
the arithmetic is identical on every backend, so the CPU count is the TPU count.

    JAX_PLATFORMS=cpu python scripts/flops_count.py [--l2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--l2", action="store_true", help="L2-every-step mode")
    parser.add_argument(
        "--block",
        type=int,
        default=None,
        help="override block size (run with two values to check whether XLA's "
        "cost analysis multiplies the scan body by its trip count)",
    )
    args = parser.parse_args()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench import BLOCK as BENCH_BLOCK

    BLOCK = args.block or BENCH_BLOCK
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
    pmoves = jnp.zeros(cfg.mcmc.adapt_frequency)
    t = jnp.zeros((), jnp.int32)

    lowered = jax.jit(block, static_argnums=(4,)).lower(
        state, key, pmoves, t, BLOCK
    )
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_accessed = cost.get("bytes accessed", float("nan"))
    mode = "l2" if args.l2 else "lean"
    print(
        f"mode={mode} block={BLOCK} flops/block={flops:.4g} "
        f"flops/iter={flops / BLOCK:.4g} "
        f"bytes/iter={bytes_accessed / BLOCK:.4g}"
    )


if __name__ == "__main__":
    main()

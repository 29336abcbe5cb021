"""Standalone observable evaluation on trained checkpoints.

The reference evaluates observables through the external ``netobs`` CLI
(``/root/reference/deephall/netobs_bridge/``).  This runner provides the same
capability without that dependency: restore a checkpoint + its ``config.yml`` sidecar,
walk the Metropolis chain, accumulate any registered estimator, and save an ``.npz``.
The netobs plugin surface is kept separately in ``deephall_tpu.netobs_bridge``.

Usage::

    python -m deephall_tpu.observables.runner CKPT --estimator overlap --steps 100
"""

from __future__ import annotations

import logging
import sys
from argparse import ArgumentParser

import jax
import numpy as np
import yaml
from jax import numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deephall_tpu import parallel
from deephall_tpu.config import Config
from deephall_tpu.log import AnyPath, LogManager, init_logging
from deephall_tpu.mcmc import make_mcmc_step, update_mcmc_width
from deephall_tpu.networks import make_network
from deephall_tpu.observables.estimators import ESTIMATORS
from deephall_tpu.utils import setup_runtime

logger = logging.getLogger("deephall")


def load_run(ckpt_file: str):
    """Restore a checkpoint and the run config from its sidecar ``config.yml``.

    Returns:
        ``(cfg, model, params, data, mcmc_width)`` ready for evaluation.
    """
    ckpt_path = AnyPath(ckpt_file)
    config_path = AnyPath(ckpt_file.rsplit("/", 1)[0]) / "config.yml"
    with config_path.open() as f:
        raw = yaml.safe_load(f)
    raw.pop("git_commit", None)
    cfg = Config.from_dict(raw)
    model = make_network(cfg.system, cfg.network)
    _, state, _ = LogManager.restore_checkpoint(ckpt_path)
    return cfg, model, state.params, state.data, state.mcmc_width


def evaluate_observable(
    cfg: Config,
    model,
    params,
    data,
    mcmc_width,
    estimator_name: str,
    steps: int = 100,
    mcmc_steps: int | None = None,
    seed: int = 0,
    estimator_kwargs: dict | None = None,
) -> dict[str, np.ndarray]:
    """Walk the chain and accumulate one estimator for ``steps`` evaluations."""
    setup_runtime()  # highest-precision matmuls: ratios/energies feed the physics
    mesh = parallel.get_mesh()
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    rep_sharding = NamedSharding(mesh, P())
    params = jax.device_put(params, rep_sharding)
    data = jax.device_put(jnp.asarray(data), data_sharding)
    width = jax.device_put(jnp.asarray(mcmc_width), rep_sharding)

    network = model.apply  # natively batched
    mcmc_step = jax.jit(
        make_mcmc_step(
            jax.vmap(network, in_axes=(None, 0)), steps=mcmc_steps or cfg.mcmc.steps
        ),
        donate_argnums=(1,),
    )
    est = ESTIMATORS[estimator_name](cfg, network, **(estimator_kwargs or {}))
    evaluate = jax.jit(est.evaluate)

    state = est.init(steps)
    key = jax.random.PRNGKey(seed)
    # Host-side proposal-width adaptation (reference mcmc.py:153-186): the
    # checkpoint width was adapted for the *training* chain; an estimator run
    # with a different mcmc_steps or a drifted state re-tunes toward the
    # [0.5, 0.55] acceptance window. Cadence is compressed to the run length
    # so short estimation walks still engage it at least a few times.
    adapt = max(1, min(cfg.mcmc.adapt_frequency, steps // 5))
    pmoves = np.zeros(adapt)
    for i in range(steps):
        key, k_walk, k_eval = jax.random.split(key, 3)
        data, pmove = mcmc_step(params, data, k_walk, width)
        state = evaluate(params, k_eval, data, state)
        width, pmoves = update_mcmc_width(i, width, adapt, pmove, pmoves)
        # Sync every step: dispatch is async, and on tunnelled runtimes letting a
        # deep backlog accumulate can wedge the final readback entirely (observed:
        # a 100-step chain whose digest never returned). One sync costs ~27 ms —
        # negligible against a ~1 s estimator step — and makes the progress log
        # report completed (not merely queued) steps.
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        if (i + 1) % max(1, steps // 10) == 0:
            logger.info("observable %s: step %d/%d", estimator_name, i + 1, steps)
    return est.digest(state, steps)


def cli(argv: list[str] | None = None) -> None:
    """Command-line entry for observable evaluation."""
    parser = ArgumentParser(prog="deephall-tpu-observe")
    parser.add_argument("ckpt", help="checkpoint .npz path")
    parser.add_argument("--estimator", required=True, choices=sorted(ESTIMATORS))
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--mcmc-steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None, help="output .npz (default: print)")
    parser.add_argument(
        "--ed-state", type=int, default=0,
        help="ed_overlap only: ED eigenstate index within the target Lz block "
        "(chained sector states, scripts/magnetoroton.py)",
    )
    args = parser.parse_args(argv or sys.argv[1:])

    init_logging()
    parallel.initialize_distributed()  # multi-host: rendezvous before backend use
    cfg, model, params, data, width = load_run(args.ckpt)
    estimator_kwargs = (
        {"state": args.ed_state} if args.estimator == "ed_overlap" else None
    )
    results = evaluate_observable(
        cfg, model, params, data, width, args.estimator, args.steps, args.mcmc_steps,
        args.seed, estimator_kwargs=estimator_kwargs,
    )
    if jax.process_index() != 0:
        return  # accumulators are replicated; process 0 owns the artifacts
    if args.out:
        np.savez(args.out, **results)
        logger.info("Saved %s", args.out)
    else:
        for key, value in results.items():
            print(key, np.asarray(value))


if __name__ == "__main__":
    cli()

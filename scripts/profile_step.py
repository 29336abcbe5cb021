"""Decompose per-iteration wall time: MCMC vs loss+grad vs KFAC extras.

Run on any backend; on the real TPU chip this guides kernel work:

    python scripts/profile_step.py [--flux 15] [--nelec 6] [--batch 3360]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def timeit(fn, *args, n=5, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--flux", type=int, default=15)
    parser.add_argument("--nelec", type=int, default=6)
    parser.add_argument("--batch", type=int, default=3360)
    args = parser.parse_args()

    jax.config.update("jax_default_matmul_precision", "highest")
    from deephall_tpu import optimizers, parallel
    from deephall_tpu.config import Config
    from deephall_tpu.loss import LossMode, make_loss_fn
    from deephall_tpu.mcmc import make_mcmc_step
    from deephall_tpu.networks import make_network
    from deephall_tpu.train import init_guess
    from deephall_tpu.types import CheckpointState
    from deephall_tpu.utils import pack_complex

    cfg = Config()
    cfg.system.nspins = (args.nelec, 0)
    cfg.system.flux = args.flux
    cfg.batch_size = args.batch

    mesh = parallel.get_mesh()
    data_sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    rep = NamedSharding(mesh, P())
    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((args.nelec, 2))
    params = jax.device_put(jax.jit(model.init)(jax.random.PRNGKey(0), sample), rep)
    data = jax.device_put(
        init_guess(jax.random.PRNGKey(1), cfg.batch_size, args.nelec), data_sharding
    )
    width = jax.device_put(jnp.asarray(0.1), rep)
    key = jax.random.PRNGKey(2)

    batch_network = jax.vmap(model.apply, in_axes=(None, 0))

    # 1. single batched forward
    fwd = jax.jit(lambda p, d: batch_network(p, d).real)
    t_fwd = timeit(fwd, params, data)
    print(f"forward (batch {args.batch}):            {t_fwd*1e3:9.2f} ms")

    # 2. full MCMC step (10 moves)
    mcmc_step = jax.jit(make_mcmc_step(batch_network, steps=cfg.mcmc.steps))
    t_mcmc = timeit(mcmc_step, params, data, key, width)
    print(f"mcmc step (10 moves):                    {t_mcmc*1e3:9.2f} ms")

    # 3. local energy only (the Laplacian pipeline)
    diff_loss = jax.jit(
        lambda p, d: pack_complex(
            make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_DIFF)(p, d)[0]
        )
    )
    t_el = timeit(diff_loss, params, data)
    print(f"local energy (hessian pipeline):         {t_el*1e3:9.2f} ms")

    # 4. loss + energy gradient (adds one weighted VJP)
    grad_loss = jax.jit(
        lambda p, d: pack_complex(
            make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_GRAD)(p, d)[1]
        )
    )
    t_grad = timeit(grad_loss, params, data)
    print(f"loss + energy gradient:                  {t_grad*1e3:9.2f} ms")

    # 5. full KFAC training step
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, key, data)
    state = CheckpointState(params, data, opt_state, width)

    def step_packed(state, key):
        new_state, stats = training_step(state, key)
        return new_state, pack_complex(stats)

    jstep = jax.jit(step_packed)
    t_step = timeit(jstep, state, key)
    print(f"full KFAC training step:                 {t_step*1e3:9.2f} ms")
    print(f"=> iteration (mcmc + step):              {(t_mcmc+t_step)*1e3:9.2f} ms "
          f"({1/(t_mcmc+t_step):.3f} it/s)")


if __name__ == "__main__":
    main()

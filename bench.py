"""Benchmark: VMC iterations/sec at the production config (N=6, 2Q=15, nu=1/3).

Runs the full hot loop (10-step MCMC + KFAC training step) on the available device(s)
at the reference's production workload (``/root/reference/README.md:33-36``: batch
3360, KFAC, 10 MCMC steps/iter) and prints ONE JSON line.

The reference publishes no throughput numbers (BASELINE.md); the ``vs_baseline`` field
is therefore measured against the round-1 recorded value of this framework itself
(BASELINE_ITS_PER_SEC below), so improvements across rounds are visible.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Round-1 recorded throughput on one TPU v5 lite chip (iterations/sec).
# Update when the recorded hardware baseline changes.
BASELINE_ITS_PER_SEC = 1.0244

WARMUP = 3
ITERS = 10


def main() -> None:
    jax.config.update("jax_default_matmul_precision", "highest")
    from deephall_tpu import optimizers, parallel
    from deephall_tpu.config import Config
    from deephall_tpu.mcmc import make_mcmc_step
    from deephall_tpu.networks import make_network
    from deephall_tpu.train import init_guess
    from deephall_tpu.types import CheckpointState
    from deephall_tpu.utils import pack_complex

    cfg = Config()
    cfg.seed = 42
    cfg.system.nspins = (6, 0)
    cfg.system.flux = 15
    cfg.batch_size = 3360
    cfg.optim.optimizer = "kfac"

    mesh = parallel.get_mesh()
    n_devices = len(mesh.devices.flatten())
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

    batch_network = jax.vmap(model.apply, in_axes=(None, 0))
    mcmc_step = jax.jit(
        make_mcmc_step(batch_network, steps=cfg.mcmc.steps), donate_argnums=(1,)
    )
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(2), data)

    def step_packed(state, key):
        new_state, stats = training_step(state, key)
        return new_state, pack_complex(stats)

    jit_step = jax.jit(step_packed, donate_argnums=(0,))

    state = CheckpointState(params, data, opt_state, width)
    key = jax.random.PRNGKey(3)

    def one_iter(state, key):
        key, k1, k2 = jax.random.split(key, 3)
        new_data, pmove = mcmc_step(state.params, state.data, k1, state.mcmc_width)
        state = state._replace(data=new_data)
        state, stats = jit_step(state, k2)
        return state, stats, key

    for _ in range(WARMUP):
        state, stats, key = one_iter(state, key)
    jax.block_until_ready(state)

    start = time.perf_counter()
    for _ in range(ITERS):
        state, stats, key = one_iter(state, key)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start

    its_per_sec = ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "vmc_iterations_per_sec_n6_q15_batch3360_kfac",
                "value": round(its_per_sec, 4),
                "unit": "iter/s",
                "vs_baseline": round(its_per_sec / BASELINE_ITS_PER_SEC, 4),
                "devices": n_devices,
                "energy": round(float(stats["energy"].real), 4),
            }
        )
    )


if __name__ == "__main__":
    main()

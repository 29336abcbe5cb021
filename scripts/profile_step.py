"""Decompose per-iteration wall time: forward, MCMC, local energy, KFAC, full block.

Measures with *chained dispatches and one final sync* — on tunnelled TPU runtimes a
per-call host readback costs ~27 ms and poisons naive timings.

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


def chain_time(fn, x0, n=10):
    """Average ms/call over n chained calls (sync once at the end)."""
    out = fn(x0)
    jax.block_until_ready(out)
    start = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - start) / n * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--flux", type=int, default=15)
    parser.add_argument("--nelec", type=int, default=6)
    parser.add_argument("--batch", type=int, default=3360)
    parser.add_argument(
        "--fast",
        action="store_true",
        help="forward-Laplacian local energy (system.compute_l2=false)",
    )
    args = parser.parse_args()

    from deephall_tpu import optimizers
    from deephall_tpu.config import Config
    from deephall_tpu.loss import LossMode, make_loss_fn
    from deephall_tpu.mcmc import make_mcmc_step
    from deephall_tpu.networks import make_network
    from deephall_tpu.train import init_guess, make_iteration_block
    from deephall_tpu.types import CheckpointState
    from deephall_tpu.utils import pack_complex, setup_runtime

    setup_runtime()
    cfg = Config()
    cfg.system.nspins = (args.nelec, 0)
    cfg.system.flux = args.flux
    cfg.batch_size = args.batch
    cfg.system.compute_l2 = not args.fast

    model = make_network(cfg.system, cfg.network)
    sample = jnp.zeros((args.nelec, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    data = init_guess(jax.random.PRNGKey(1), cfg.batch_size, args.nelec)
    key = jax.random.PRNGKey(2)

    # Same sweep-network construction as the training driver / bench.py
    # (honors DEEPHALL_MCMC_NETWORK and DEEPHALL_MCMC_DTYPE).
    from deephall_tpu.train import make_sweep_network

    batch_network = make_sweep_network(model.apply)

    fwd = jax.jit(lambda d: d + 1e-9 * batch_network(params, d).real.sum())
    print(f"forward (batch {args.batch}):        {chain_time(fwd, data):9.2f} ms")

    # Determinant micro-benchmark: the forward's slogdet share (batch x ndet tiny
    # complex matrices through the split-real LU).
    from deephall_tpu.ops.slogdet import signed_logsumdet

    ndet = cfg.network.psiformer.determinants
    orb0 = jax.random.normal(
        jax.random.PRNGKey(7), (args.batch, ndet, args.nelec, args.nelec, 2)
    )
    sld = jax.jit(
        lambda o: o + 1e-9 * signed_logsumdet(o[..., 0] + 1j * o[..., 1]).real.sum()
    )
    print(f"slogdet (batch x {ndet} dets):      {chain_time(sld, orb0):9.2f} ms")

    mcmc_step_fn = make_mcmc_step(batch_network, steps=cfg.mcmc.steps)
    mc = jax.jit(lambda d: mcmc_step_fn(params, d, key, jnp.asarray(0.1))[0])
    print(f"mcmc sweep ({cfg.mcmc.steps} moves):            {chain_time(mc, data):9.2f} ms")

    diff_loss = make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_DIFF, model=model)
    el = jax.jit(lambda d: d + 1e-9 * diff_loss(params, d)[0]["energy"].real)
    label = "fwdlap" if args.fast else "hessian"
    print(f"local energy ({label}):{'':{9 - len(label)}}{chain_time(el, data):9.2f} ms")

    if args.fast:
        # Determinant share of the jet pipeline: logsumdet_jet at production
        # shapes ([B, ndet, n, n] orbital jets, K+3 packed channels).
        from deephall_tpu.ops import fwdlap as fl

        kp1 = 2 * args.nelec + 1
        shp = (args.batch, ndet, args.nelec, args.nelec)
        # Complex cannot cross the host boundary on this runtime: carry a real
        # buffer through the chain and assemble the complex jet inside jit.
        buf = jax.random.normal(jax.random.PRNGKey(11), (2, kp1 + 3, *shp))

        def lsd(b):
            c = b[0] + 1j * b[1]  # [kp1+3, *shp]
            pj = fl.Jet(c[0], c[1 : kp1 + 1], c[kp1 + 1], c[kp1 + 2 :])
            out = fl.logsumdet_jet(pj).x.real  # [batch]
            return b + 1e-9 * out[None, None, :, None, None, None]

        print(
            f"logsumdet_jet (det share):       {chain_time(jax.jit(lsd), buf):9.2f} ms"
        )

    grad_loss = make_loss_fn(model.apply, cfg.system, LossMode.ENERGY_GRAD, model=model)
    gl = jax.jit(
        lambda d: d + 1e-9 * jax.tree.leaves(grad_loss(params, d)[1])[0].sum()
    )
    print(f"loss + energy gradient:          {chain_time(gl, data):9.2f} ms")

    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, key, data)
    state = CheckpointState(params, data, opt_state, jnp.asarray(0.1))

    def step_packed(s, k):
        ns, stats = training_step(s, k)
        return ns, pack_complex(stats)

    jstep = jax.jit(step_packed)
    s, out = jstep(state, key)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for i in range(5):
        s, out = jstep(s, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    t_step = (time.perf_counter() - start) / 5 * 1e3
    print(f"full KFAC training step:         {t_step:9.2f} ms")

    block = make_iteration_block(cfg, mcmc_step_fn, training_step)
    pm = jnp.zeros(cfg.mcmc.adapt_frequency)
    t = jnp.zeros((), jnp.int32)
    st, k2, pm, t, outs = block(state, key, pm, t, 10)
    st, k2, pm, t, outs = block(st, k2, pm, t, 10)
    jax.block_until_ready(outs)
    start = time.perf_counter()
    st, k2, pm, t, outs = block(st, k2, pm, t, 10)
    jax.block_until_ready(outs)
    t_iter = (time.perf_counter() - start) / 10 * 1e3
    print(f"fused iteration (block of 10):   {t_iter:9.2f} ms  ({1e3/t_iter:.2f} it/s)")


if __name__ == "__main__":
    main()

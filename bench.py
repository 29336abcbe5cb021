"""Benchmark: VMC iterations/sec at the production config (N=6, 2Q=15, nu=1/3).

Runs the full hot loop (10-step MCMC + in-graph width adaptation + KFAC training
step) at the reference's production workload (``/root/reference/README.md:33-36``:
batch 3360, KFAC, 10 MCMC steps/iter) using the same fused iteration block as the
training driver (``lax.scan`` over iterations inside one dispatch), and prints ONE
JSON line.

Two modes are measured, both on the forward-Laplacian jet pipeline: the
headline ``value`` has the optional L^2 observable off (energy/Lz/Lz^2 exact),
and ``l2_every_step_its_per_sec`` is the reference-parity default that also
computes L^2 each step via two extra jet directions (the third coincides with
the Lz one).

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline`` is
measured against this framework's round-1 first recorded value
(BASELINE_ITS_PER_SEC), so improvements across rounds are visible.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Round-1 first recorded throughput on one TPU v5 lite chip (iterations/sec).
BASELINE_ITS_PER_SEC = 1.0244

BLOCK = 10
MEASURE_BLOCKS = 3


def build_production_block(compute_l2: bool, block_size: int = BLOCK):
    """Build the fused production block and its initial device state.

    Shared by ``bench.py``, ``scripts/capture_trace.py`` and
    ``scripts/flops_count.py`` so the three measurement surfaces always
    construct the identical program — including the ``DEEPHALL_MCMC_NETWORK``
    sweep-network knob the training driver honors.

    Returns ``(cfg, block, state, key, pmoves, t)``.
    """
    from deephall_tpu import optimizers, parallel
    from deephall_tpu.config import Config
    from deephall_tpu.mcmc import make_mcmc_step
    from deephall_tpu.networks import make_network
    from deephall_tpu.train import init_guess, make_iteration_block, make_sweep_network
    from deephall_tpu.types import CheckpointState

    cfg = Config()
    cfg.seed = 42
    cfg.system.nspins = (6, 0)
    cfg.system.flux = 15
    cfg.system.compute_l2 = compute_l2
    cfg.batch_size = 3360
    cfg.optim.optimizer = "kfac"
    cfg.optim.block_size = block_size

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

    # Same sweep-network construction as the training driver (train.py
    # make_sweep_network): honors DEEPHALL_MCMC_NETWORK (vmap/batched layout)
    # and DEEPHALL_MCMC_DTYPE (reduced-precision bf16 tower).
    mcmc_network = make_sweep_network(model.apply)
    mcmc_step_fn = make_mcmc_step(mcmc_network, steps=cfg.mcmc.steps)
    opt_init, training_step = optimizers.make_optimizer_step(cfg, model, sample)
    opt_state = jax.jit(opt_init)(params, jax.random.PRNGKey(2), data)

    block = make_iteration_block(cfg, mcmc_step_fn, training_step)
    state = CheckpointState(params, data, opt_state, width)
    key = jax.random.PRNGKey(3)
    pmoves = jax.device_put(jnp.zeros(cfg.mcmc.adapt_frequency), rep_sharding)
    t = jax.device_put(jnp.zeros((), jnp.int32), rep_sharding)
    return cfg, block, state, key, pmoves, t


# Plausibility floor for the self-validation below: the best recorded
# steady-state rates on this hardware (PERF_NOTES round 4).  A median more
# than REJECT_FACTOR below the record is a measurement artifact (stalled
# tunnel), not a real regression — round 4's driver-captured lean number was
# 0.61 it/s (20x below record) because all three windows stalled right after
# the fresh compiles, and bench.py published it without a sanity check
# (BENCH_r04.json; VERDICT round 4).  Update when the record moves.
RECORD_ITS = {"lean": 12.55, "l2_mode": 11.32}
REJECT_FACTOR = 3.0


def validate_rates(
    lean_rates: list[float], l2_rates: list[float]
) -> list[str]:
    """Sanity-check raw measurement windows; returns rejection reasons.

    Three invariants a healthy measurement cannot violate:

    * the lean pipeline (L^2 observable off) does strictly less work per
      iteration than the L^2-every-step mode, so ``median(lean) >=
      median(l2_mode)`` up to noise (10% grace);
    * steady-state windows agree to 3 decimals (BASELINE.md methodology), so
      windows disagreeing by >2x mean the tunnel stalled mid-measurement;
    * a median more than ``REJECT_FACTOR`` below the recorded steady state is
      a stall epoch, not a regression (real regressions arrive in code
      reviews, not 20x cliffs between identical programs).
    """
    reasons = []
    lean = sorted(lean_rates)[len(lean_rates) // 2]
    l2_mode = sorted(l2_rates)[len(l2_rates) // 2]
    if lean < 0.9 * l2_mode:
        reasons.append(
            f"lean median {lean:.3f} < L2-mode median {l2_mode:.3f}"
        )
    for name, rates in (("lean", lean_rates), ("l2_mode", l2_rates)):
        if min(rates) > 0 and max(rates) / min(rates) > 2.0:
            reasons.append(
                f"{name} windows disagree >2x: "
                + "/".join(f"{r:.2f}" for r in rates)
            )
        median = sorted(rates)[len(rates) // 2]
        if median < RECORD_ITS[name] / REJECT_FACTOR:
            reasons.append(
                f"{name} median {median:.3f} is >{REJECT_FACTOR:.0f}x below "
                f"the recorded steady state {RECORD_ITS[name]}"
            )
    return reasons


def measure(compute_l2: bool) -> tuple[list[float], float]:
    """Measure iterations/sec of the fused production block.

    Returns the raw three window rates (median taken by the caller *after*
    validation) and the final energy.
    """
    _, block, state, key, pmoves, t = build_production_block(compute_l2)

    # Warmup twice: the first call compiles for the initial (host-placed) input
    # shardings; its outputs carry the jit-chosen shardings, so the second call
    # compiles the steady-state signature that the measured calls then reuse.
    for _ in range(2):
        state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
    jax.block_until_ready(outs)

    # Median of three measurement windows: the shared tunnel/device pool can
    # stall a window by 2-4x right after fresh compiles or when another job
    # touches the chip (see PERF_NOTES.md "Measurement pitfalls"); the median
    # tolerates one stalled window without the upward bias of best-of-N.
    # Steady-state windows agree to 3 decimals. (Methodology: rounds 1-2 used
    # single-window then best-of-2; see BASELINE.md.)
    rates = []
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(MEASURE_BLOCKS):
            state, key, pmoves, t, outs = block(state, key, pmoves, t, BLOCK)
        # Force a genuine device sync: read a value that depends on every
        # iteration (block_until_ready alone can return early on tunnelled
        # runtimes).
        float(jax.device_get(outs[0]["energy"].real[-1]))
        elapsed = time.perf_counter() - start
        rates.append(BLOCK * MEASURE_BLOCKS / elapsed)

    stats, _ = outs
    return rates, float(stats["energy"].real[-1])


def measure_validated(
    attempts: int = 4, backoff_s: float = 120.0
) -> tuple[float, float, float, list[str]]:
    """Measure both modes with self-validation and stall retries.

    The L^2-every-step mode runs FIRST each attempt: it shares every compiled
    sub-program with the lean mode, so it absorbs the post-compile tunnel
    stalls that wrecked the round-3/4 lean captures (the lean headline then
    measures on a warm tunnel).  A measurement failing :func:`validate_rates`
    is retried after a backoff; after ``attempts`` tries the best-so-far
    numbers are returned along with the outstanding reasons so the caller can
    flag the JSON rather than publish garbage silently.

    Returns ``(lean_its, l2_its, energy, reasons)``.
    """
    best: tuple[float, float, float, list[str]] | None = None
    for attempt in range(attempts):
        l2_rates, _ = measure(compute_l2=True)
        lean_rates, energy = measure(compute_l2=False)
        reasons = validate_rates(lean_rates, l2_rates)
        lean = sorted(lean_rates)[1]
        l2_mode = sorted(l2_rates)[1]
        if not reasons:
            return lean, l2_mode, energy, []
        if best is None or lean > best[0]:
            best = (lean, l2_mode, energy, reasons)
        print(
            f"bench: attempt {attempt + 1}/{attempts} rejected "
            f"({'; '.join(reasons)}); retrying in {backoff_s:.0f}s",
            file=sys.stderr,
        )
        if attempt < attempts - 1:
            time.sleep(backoff_s)
    assert best is not None
    return best


# The image's sitecustomize consumes JAX_PLATFORMS before user code runs, so a
# CPU-forced caller (tests) must re-force CPU via the config API inside the
# probe too — otherwise the probe would initialise the TPU plugin regardless.
_PROBE = (
    "import os, jax; "
    "cpu = 'cpu' in os.environ.get('JAX_PLATFORMS', ''); "
    "jax.config.update('jax_platforms', 'cpu') if cpu else None; "
    "import jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); print(float((x @ x).sum()))"
)


def wait_for_backend(budget_s: float | None = None, probe_timeout_s: float = 300.0):
    """Block until the accelerator backend answers a tiny probe, or give up.

    The tunnelled TPU runtime can be down transiently (hours-long axon outages
    observed); a bench launched into a dead tunnel would otherwise hang forever
    inside backend init and produce no JSON line at all.  The probe runs in a
    subprocess so a wedged tunnel cannot hang *this* process, and is retried
    until ``DEEPHALL_BENCH_WAIT_S`` (default 3600) is exhausted — then raises,
    loudly, rather than printing a made-up number.
    """
    if budget_s is None:
        budget_s = float(os.environ.get("DEEPHALL_BENCH_WAIT_S", "3600"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if proc.returncode == 0:
                if attempt > 1:
                    print(f"bench: backend healthy after {attempt} probes", file=sys.stderr)
                return
            detail = proc.stderr.decode(errors="replace").strip().splitlines()
            detail = detail[-1] if detail else f"exit {proc.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"probe timed out after {probe_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(
                f"accelerator backend unreachable after {attempt} probes "
                f"({budget_s:.0f}s budget); last: {detail}"
            )
        print(
            f"bench: backend not ready ({detail}); retrying, "
            f"{remaining / 60:.0f} min left",
            file=sys.stderr,
        )
        time.sleep(min(120.0, max(1.0, remaining)))


def main() -> None:
    from deephall_tpu.utils import setup_runtime

    wait_for_backend()
    setup_runtime()
    n_devices = len(jax.devices())
    fast_its, full_its, fast_energy, reasons = measure_validated()
    record = {
        "metric": "vmc_iterations_per_sec_n6_q15_batch3360_kfac",
        "value": round(fast_its, 4),
        "unit": "iter/s",
        "vs_baseline": round(fast_its / BASELINE_ITS_PER_SEC, 4),
        "l2_every_step_its_per_sec": round(full_its, 4),
        "devices": n_devices,
        "energy": round(fast_energy, 4),
    }
    if reasons:
        # Still implausible after every retry: publish the best-so-far
        # numbers but say so, loudly, in the record itself.
        record["suspect"] = "; ".join(reasons)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

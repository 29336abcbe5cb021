#!/bin/bash
# Round-4 N=6 magnetoroton relaunch on the adaptive-selector driver (TPU),
# supervised: the sweep driver is resumable by design (done rows skipped,
# partial sectors resume their own checkpoints, a resume point beyond the
# plan gets a fresh settle leg), so infra failures the in-process retry
# cannot recover — e.g. the measured TPU worker crash at prod_jain37 step
# 23079, which surfaces at the stats readback with the donated state gone —
# are ridden out by relaunching the whole driver. A deliberate stop goes
# through the stop file, not SIGTERM alone.
#
# Warm start: the converged prod_r4 ground state (E = 6.86841(4), BASELINE.md).
# Selector: adaptive (config.System.l2_adaptive) — in-graph stiffness
# k_eff = k * clip(<L^2> - c, 0, 1) with the Lz penalty raised to 3*m*k_eff;
# chosen after the constant-k stiffness dilemma measured on sectors 2/3
# (gentle k cannot hold the state against the energy drift toward the L=4
# roton minimum, stiff k wrecks the energy — PERF_NOTES/BASELINE round 4).
# Sector order: easy-first (4, 5, 6 are lowest-or-nearly-lowest in their Lz
# windows), then the hard rows 3 and 2. NOTE (round-5 correction): this
# launch only reached sectors 4 and 5 before the round ended, and the
# sector_2/sector_3 run state (~56k/58k steps) plus the
# dispersion_r4_{initial,stiff}.csv archives were lost with the runs/ wipe —
# on current disk runs/roton13 holds sector_4, sector_5 and
# dispersion_r4_adaptive.csv only, so sectors 2/3 start fresh from the
# ground warm start (handled by the driver). Superseded by
# r5_roton_sweep.sh (ED-informed settle stiffness + row-quality gates).
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/roton_stop
rm -f "$STOP"
# Wall-clock budget (default 5h): the driver's end-of-round bench capture
# needs the TPU free, so the supervisor stops relaunching near the deadline
# and timeout's SIGTERM drains the current run through the graceful-shutdown
# checkpoint path.
DEADLINE=$(( $(date +%s) + ${ROTON_BUDGET_S:-18000} ))
for attempt in $(seq 1 24); do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 600 ] && { echo "deadline reached; not relaunching"; break; }
  timeout -k 120 "$REMAIN" python scripts/magnetoroton.py \
    --config artifacts/prod_r4/config.yml \
    --restore artifacts/prod_r4/ckpt_019999.npz \
    --out runs/roton13 \
    --sectors 4 5 6 3 2 \
    --selector adaptive \
    --iterations 16000 \
    --dotlist log.initial_energy=false && break
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  echo "sweep died (attempt $attempt); relaunching in 120s"
  sleep 120
done

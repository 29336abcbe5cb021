#!/bin/bash
# Round-4 N=6 magnetoroton relaunch on the settle-stage driver (TPU),
# supervised: the sweep driver is resumable by design (done rows skipped,
# partial sectors resume their own checkpoints, a resume point beyond the
# plan gets a fresh settle leg), so infra failures the in-process retry
# cannot recover — e.g. the measured TPU worker crash at prod_jain37 step
# 23079, which surfaces at the stats readback with the donated state gone —
# are ridden out by relaunching the whole driver. A deliberate stop goes
# through the stop file, not SIGTERM alone.
#
# Warm start: the converged prod_r4 ground state (E = 6.86841(4), BASELINE.md).
# Sector state on disk (runs/roton13): sectors 2/3 resume at step ~56k (beyond
# any plan -> fresh settle leg), sector 4 resumes at 30002 (plan targets
# 24800/29600/36000 -> pure settle leg), sectors 5/6 run the full
# escape/purify/settle plan from the ground checkpoint.
# The stiff-stage rows this relaunch replaces are preserved in
# runs/roton13/dispersion_r4_stiff.csv.
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/roton_stop
rm -f "$STOP"
for attempt in $(seq 1 24); do
  python scripts/magnetoroton.py \
    --config runs/prod_r4/config.yml \
    --restore runs/prod_r4/ckpt_019999.npz \
    --out runs/roton13 \
    --sectors 2 3 4 5 6 \
    --iterations 16000 \
    --dotlist log.initial_energy=false && break
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  echo "sweep died (attempt $attempt); relaunching in 120s"
  sleep 120
done

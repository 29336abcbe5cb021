#!/bin/bash
# Round-5 N=10 nu=1/3 ground state: converge BELOW the exact LLL energy.
#
# Round 2 trained this system (2Q = 3(N-1) = 27, Coulomb, batch 3360, KFAC)
# for 15k iterations and landed at 14.28258(34) — 0.0027 ABOVE the exact
# LLL ground energy 14.27987 (native-Lanczos ED, BASELINE.md), i.e. an
# under-trained state: every converged family in the table sits below ED
# via Landau-level mixing.  That run's checkpoint lived in runs/ and was
# wiped; this is a fresh train at the round-4/5 pipeline (bf16 sampler,
# single-pullback KFAC capture — ~15% faster than round 2's) with a larger
# iteration budget, cut by wall-clock (N10_BUDGET_S) rather than step count.
#
# Same wedge-watchdog supervision as r5_roton_sweep2.sh: the measured
# round-5 failure mode is a tunnel wedge (a device readback hangs forever,
# SIGTERM cannot drain it), detected as log-mtime silence — 7 min mid-run,
# 25 min while the (cold) training step compiles remotely.  The driver
# auto-resumes from the newest checkpoint under log.save_path, so a kill
# costs at most save_step_interval = 1000 steps (~4 min at ~4 it/s).
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/n10_stop
rm -f "$STOP"
DEADLINE=$(( $(date +%s) + ${N10_BUDGET_S:-5400} ))
OUT=runs/prod_n10_r5
mkdir -p "$OUT"
LOG=$OUT/train.log
for attempt in $(seq 1 24); do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 300 ] && { echo "deadline reached; not relaunching"; break; }
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  python -m deephall_tpu.train \
    system.nspins=[10,0] system.flux=27 system.compute_l2=false \
    batch_size=3360 seed=47 \
    optim.iterations=40000 optim.block_size=10 \
    log.save_path="$OUT" log.save_step_interval=1000 \
    log.initial_energy=false \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "launched n10 driver pid=$PID (attempt $attempt, remain ${REMAIN}s)"
  RC=""
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; RC=$?
      break
    fi
    NOW=$(date +%s)
    if [ "$NOW" -gt "$DEADLINE" ]; then
      echo "deadline passed; SIGTERM (graceful checkpoint) pid=$PID"
      kill -TERM "$PID"; sleep 120
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      RC=124
      break
    fi
    AGE=$(( NOW - $(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW") ))
    if tail -1 "$LOG" 2>/dev/null | grep -q "^step="; then
      LEASH=420
    else
      LEASH=1500
    fi
    if [ "$AGE" -gt "$LEASH" ]; then
      echo "watchdog: stall (log idle ${AGE}s > ${LEASH}s leash); killing pid=$PID"
      kill -9 "$PID"
      wait "$PID" 2>/dev/null
      RC=137
      break
    fi
  done
  [ "$RC" = "0" ] && { echo "n10 run completed"; break; }
  [ "$RC" = "124" ] && { echo "n10 run cut at deadline"; break; }
  [ -f "$STOP" ] && break
  echo "n10 run ended rc=$RC (attempt $attempt); relaunching in 60s"
  sleep 60
done

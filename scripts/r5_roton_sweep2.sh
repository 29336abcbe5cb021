#!/bin/bash
# Round-5 N=6 magnetoroton production sweep, v2: watchdog-supervised.
#
# v1 (r5_roton_sweep.sh) relaunch-looped on process *exit*, but the measured
# round-5 failure mode is a tunnel WEDGE: the dispatch backlog hangs a device
# readback forever, the process never exits, SIGTERM cannot drain it (the
# graceful latch only runs between host-loop steps, and the loop is stuck
# inside the readback), and the sweep silently burns its budget (observed:
# sector 4 frozen at step 67279 for 16+ min, process CPU time flat; the
# device itself answered a fresh-process probe fine). This supervisor runs
# the driver in the background and watches the sweep LOG's mtime — per-step
# stat lines flush every ~1s block, so a stale log mid-leg is a wedge.
# Leg boundaries are different: a fresh executable (notably the first
# --settle-lr-delay leg) compiles remotely for 5-20 min with no output, so
# when the last log line is a phase-boundary message rather than a step
# line, the leash is 25 min instead of 7. Checkpoint loss on a kill is
# bounded by log.save_step_interval (1000 steps ~ 2 min).
#
# Driver changes vs v1: --settle-lr-delay 8000 keeps settle legs in the
# productive LR band (~0.005) despite the 50-70k warm-start step counters
# (measured: the delay=2000 schedule left sector 4 drifting at -2.3e-3/1k,
# hopeless against its 0.05 remaining energy gap).
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/roton_stop
rm -f "$STOP"
DEADLINE=$(( $(date +%s) + ${ROTON_BUDGET_S:-19800} ))
OUT=runs/roton13
LOG=$OUT/sweep_r5.log
for attempt in $(seq 1 48); do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 600 ] && { echo "deadline reached; not relaunching"; break; }
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  python scripts/magnetoroton.py \
    --config artifacts/prod_r4/config.yml \
    --restore artifacts/prod_r4/ckpt_019999.npz \
    --out "$OUT" \
    --sectors 4 2 3 5 6 \
    --selector adaptive \
    --iterations 16000 \
    --settle-lr-delay 8000 \
    --dotlist log.initial_energy=false optim.block_size=10 \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "launched driver pid=$PID (attempt $attempt, remain ${REMAIN}s)"
  RC=""
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; RC=$?
      break
    fi
    NOW=$(date +%s)
    if [ "$NOW" -gt "$DEADLINE" ]; then
      echo "deadline passed; stopping driver pid=$PID"
      kill -TERM "$PID"; sleep 90
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      RC=124
      break
    fi
    AGE=$(( NOW - $(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW") ))
    if tail -1 "$LOG" 2>/dev/null | grep -q "^step="; then
      LEASH=420   # mid-leg: blocks flush ~1/s; silence is a wedge
    else
      LEASH=1500  # leg boundary: a fresh remote compile is silent for 5-20 min
    fi
    if [ "$AGE" -gt "$LEASH" ]; then
      echo "watchdog: stall (log idle ${AGE}s > ${LEASH}s leash); killing pid=$PID"
      kill -9 "$PID"
      wait "$PID" 2>/dev/null
      RC=137
      break
    fi
  done
  [ "$RC" = "0" ] && { echo "sweep completed"; break; }
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  echo "sweep ended rc=$RC (attempt $attempt); relaunching in 60s"
  sleep 60
done

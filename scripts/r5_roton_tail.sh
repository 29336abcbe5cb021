#!/bin/bash
# Round-5 magnetoroton tail coverage: short measured rows for the sectors the
# main sweep's serial budget cannot reach (N=6 sectors 5/6 — never run in any
# round).  Same wedge-watchdog supervision as r5_roton_sweep2.sh; the short
# --iterations buys a real (if unconverged) settle-leg row per sector instead
# of zero data: every leg reuses the executables the main sweep already
# compiled (dynamic penalties + shared --settle-lr-delay), so a 6k-step
# sector costs ~13 min at the measured ~8.5 it/s with no compile overhead.
# Rows that fail the quality gate are published with their honest
# status=failed(...) marker, exactly like the main sweep's.
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/roton_tail_stop
rm -f "$STOP"
DEADLINE=$(( $(date +%s) + ${ROTON_BUDGET_S:-2400} ))
OUT=runs/roton13
LOG=$OUT/sweep_r5_tail.log
SECTORS=${SECTORS:-"5 6"}
ITERS=${ITERS:-6000}
for attempt in $(seq 1 12); do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 300 ] && { echo "deadline reached; not relaunching"; break; }
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  # shellcheck disable=SC2086
  python scripts/magnetoroton.py \
    --config artifacts/prod_r4/config.yml \
    --restore artifacts/prod_r4/ckpt_019999.npz \
    --out "$OUT" \
    --sectors $SECTORS \
    --selector adaptive \
    --iterations "$ITERS" \
    --max-extend 1 \
    --settle-lr-delay 8000 \
    --dotlist log.initial_energy=false optim.block_size=10 \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "launched tail driver pid=$PID (attempt $attempt, remain ${REMAIN}s)"
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
  [ "$RC" = "0" ] && { echo "tail sweep completed"; break; }
  [ "$RC" = "124" ] && break
  [ -f "$STOP" ] && break
  echo "tail sweep ended rc=$RC (attempt $attempt); relaunching in 60s"
  sleep 60
done

#!/bin/bash
# Round-5 N=6 magnetoroton production sweep (TPU), supervised relaunch loop
# (same rationale as r4_roton_relaunch.sh: the driver is resumable by design,
# so infra failures are ridden out by relaunching; deliberate stop = stop
# file + SIGTERM).
#
# Round-5 driver design (see scripts/magnetoroton.py):
#   * ED-informed settle stiffness per sector (settle_k_from_ed): sectors
#     whose L = m member IS the Lz = m block ground state (4, 6; 5 nearly)
#     settle under a tiny k = 0.02 guard — plain Lz-pinned minimization does
#     the work; hard sectors (2: k = 0.055, 3: k = 0.021) get 10x the exact
#     ED margin, clamped to half the tunneling window.
#   * The adaptive selector runs escape + purify only; the dispersion row is
#     measured on a FIXED gentle settle leg (the adaptive equilibrium
#     impurity keeps it stiff forever — measured round 4, sector 4).
#   * Row-quality gate: variance <= 0.05, |L^2 - m(m+1)| <= 0.1,
#     |Lz - m| <= 0.05, no significant energy drift > 1e-3/1k steps;
#     failing sectors are extended (purity -> burst + fresh settle;
#     variance/drift -> longer settle) and ultimately marked failed(...).
#
# Sector order: 4 first (resumes its own ~48k-step nearly-pure state -> the
# settle-leg design is validated within ~30 min, and the roton minimum is
# the flagship row), then the hard sectors 2 and 3 with full budget, then
# 5 (resumes its own state) and 6 (fresh escape).
cd "$(dirname "$0")/.." || exit 1
STOP=/tmp/roton_stop
rm -f "$STOP"
DEADLINE=$(( $(date +%s) + ${ROTON_BUDGET_S:-21600} ))
for attempt in $(seq 1 24); do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 600 ] && { echo "deadline reached; not relaunching"; break; }
  timeout -k 120 "$REMAIN" python scripts/magnetoroton.py \
    --config artifacts/prod_r4/config.yml \
    --restore artifacts/prod_r4/ckpt_019999.npz \
    --out runs/roton13 \
    --sectors 4 2 3 5 6 \
    --selector adaptive \
    --iterations 16000 \
    --dotlist log.initial_energy=false optim.block_size=10 && break
  [ -f "$STOP" ] && { echo "stop file present; not relaunching"; break; }
  echo "sweep died (attempt $attempt); relaunching in 120s"
  sleep 120
done

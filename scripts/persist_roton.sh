#!/bin/bash
# Persist magnetoroton sweep results under artifacts/roton13 (round-4 verdict
# ask #4: runs/ is wiped between rounds, so each sector's final checkpoint +
# config sidecar and the gated dispersion.csv are committed the moment they
# exist — artifacts/README.md documents the layout).  Idempotent: keeps
# exactly one (the newest) checkpoint per sector.
set -e
cd "$(dirname "$0")/.." || exit 1
SRC=runs/roton13
DST=artifacts/roton13
for d in "$SRC"/sector_*/; do
  [ -d "$d" ] || continue
  name=$(basename "$d")
  last=$(ls "$d"/ckpt_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$last" ] || continue
  mkdir -p "$DST/$name"
  rm -f "$DST/$name"/ckpt_*.npz
  cp "$last" "$DST/$name/"
  cp "$d/config.yml" "$DST/$name/"
  echo "persisted $name: $(basename "$last")"
done
for f in dispersion.csv dispersion.png; do
  if [ -f "$SRC/$f" ]; then
    cp "$SRC/$f" "$DST/$f" && echo "persisted $f"
  fi
done
exit 0

#!/usr/bin/env bash
# One-command CI gate: lint + types + tests.
# Lint/type tools are optional in hermetic images; anything installed runs.
set -euo pipefail
cd "$(dirname "$0")/.."

if command -v ruff >/dev/null 2>&1 || python -c 'import ruff' 2>/dev/null; then
  echo "== ruff check =="
  python -m ruff check deephall_tpu tests bench.py scripts
  echo "== ruff format --check =="
  python -m ruff format --check deephall_tpu tests bench.py scripts
else
  echo "== ruff not installed; running built-in lint fallback =="
  python scripts/lint_fallback.py
fi

if command -v mypy >/dev/null 2>&1 || python -c 'import mypy' 2>/dev/null; then
  echo "== mypy =="
  python -m mypy deephall_tpu
else
  echo "== mypy not installed; skipping type check =="
fi

echo "== pytest =="
python -m pytest tests/ -x -q

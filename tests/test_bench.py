"""Tests for bench.py's backend-outage resilience.

The tunnelled TPU runtime can be down for hours (axon outages observed in
round 3); ``bench.wait_for_backend`` must hold the benchmark back until the
backend answers a probe — and fail loudly, never fabricate a number, when the
outage outlasts its budget.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_wait_for_backend_healthy():
    """On a healthy (CPU) backend the probe returns promptly."""
    bench.wait_for_backend(budget_s=600.0, probe_timeout_s=300.0)


def test_wait_for_backend_exhausts_budget(monkeypatch):
    """A dead backend raises after the budget instead of hanging or lying."""
    monkeypatch.setattr(bench, "_PROBE", "import sys; sys.exit(7)")
    with pytest.raises(RuntimeError, match="unreachable"):
        bench.wait_for_backend(budget_s=0.0, probe_timeout_s=60.0)


def test_wait_for_backend_probe_isolated(monkeypatch):
    """A wedged probe (hang, not error) cannot hang the caller past its budget."""
    monkeypatch.setattr(
        bench, "_PROBE", "import time; time.sleep(3600)"
    )
    with pytest.raises(RuntimeError, match="timed out"):
        bench.wait_for_backend(budget_s=0.0, probe_timeout_s=5.0)


def test_probe_respects_cpu_env():
    """The probe subprocess honours a CPU-forced environment (test images)."""
    proc = subprocess.run(
        [sys.executable, "-c", bench._PROBE],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    assert float(proc.stdout.strip()) == 128.0 * 128.0 * 128.0

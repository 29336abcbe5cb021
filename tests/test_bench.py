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


def test_validate_rates_accepts_healthy_windows():
    """Steady-state windows near the record pass with no reasons."""
    assert bench.validate_rates([12.5, 12.6, 12.5], [11.2, 11.3, 11.3]) == []


def test_validate_rates_rejects_stalled_epoch():
    """The BENCH_r04 failure mode: every lean window stalled on the tunnel.

    Round 4 published lean = 0.61 it/s (20x below the record, 18x below its
    own L^2-mode secondary) because all three lean windows stalled and the
    median offered no protection.  The validator must reject exactly this.
    """
    reasons = bench.validate_rates([0.61, 0.62, 0.61], [11.2, 11.3, 11.3])
    assert any("lean median" in r and "L2-mode" in r for r in reasons)
    assert any("below" in r and "recorded" in r for r in reasons)


def test_validate_rates_rejects_disagreeing_windows():
    """One window 3x off its siblings means the measurement is unreliable."""
    reasons = bench.validate_rates([4.0, 12.5, 12.6], [11.2, 11.3, 11.3])
    assert any("disagree" in r for r in reasons)


def test_measure_validated_retries_past_stall(monkeypatch):
    """A stalled first attempt is retried and the healthy retry published."""
    calls = {"n": 0}

    def fake_measure(compute_l2):
        attempt = calls["n"] // 2
        calls["n"] += 1
        if attempt == 0:  # both modes stalled on the first attempt
            return [0.6, 0.6, 0.6], 6.87
        return ([11.3] * 3, 6.87) if compute_l2 else ([12.5] * 3, 6.87)

    monkeypatch.setattr(bench, "measure", fake_measure)
    lean, l2_mode, energy, reasons = bench.measure_validated(
        attempts=3, backoff_s=0.0
    )
    assert reasons == []
    assert lean == 12.5 and l2_mode == 11.3
    assert calls["n"] == 4  # 2 modes x 2 attempts


def test_measure_validated_flags_persistent_stall(monkeypatch):
    """Numbers still implausible after every retry are flagged, not hidden."""
    monkeypatch.setattr(
        bench, "measure", lambda compute_l2: ([0.6, 0.6, 0.6], 6.87)
    )
    lean, l2_mode, energy, reasons = bench.measure_validated(
        attempts=2, backoff_s=0.0
    )
    assert reasons  # outstanding rejection reasons surface to the caller
    assert lean == 0.6

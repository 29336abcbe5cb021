"""CLI + config tests (reference ``/root/reference/tests/cli_test.py``):
Laughlin nu=1/3 inference energy ~2.58 with L^2 = 0, and YAML merge precedence."""

from pathlib import Path

import pytest
import yaml
from pytest import CaptureFixture

from deephall_tpu.train import cli


@pytest.fixture
def dotlist(tmp_path: Path):
    return [
        "seed=42",
        "system.nspins=[3, 0]",
        "system.flux=6",
        "network.type=laughlin",
        "optim.iterations=100",
        "optim.optimizer=none",
        f"log.save_path={tmp_path}",
    ]


def test_cli(dotlist: list[str], capsys: CaptureFixture[str]):
    cli(dotlist)
    captured = capsys.readouterr()
    assert "iterations: 100\n" in captured.err
    assert "energy=2.58" in captured.err
    assert "L_square=0.0000" in captured.err


def test_yml(dotlist: list[str], tmp_path: Path, capsys: CaptureFixture[str]):
    config_path = tmp_path / "config_in.yml"
    nested: dict = {}
    for item in dotlist:
        key, _, raw = item.partition("=")
        node = nested
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = yaml.safe_load(raw)
    config_path.write_text(yaml.safe_dump(nested))
    cli(["--yml", str(config_path), "optim.iterations=50"])

    captured = capsys.readouterr()
    assert "iterations: 50\n" in captured.err
    assert "energy=2.58" in captured.err
    assert "L_square=0.0000" in captured.err

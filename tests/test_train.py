"""End-to-end training tests (reference ``/root/reference/tests/train_test.py``):
tiny-Psiformer KFAC run converges to the exact LLL energy 1.5; checkpoint resume."""

from pathlib import Path

import pytest
from pytest import CaptureFixture

from deephall_tpu import Config, train


@pytest.fixture
def simple_config():
    config = Config()
    config.seed = 42
    config.system.nspins = (3, 0)
    config.system.flux = 2
    config.system.interaction_strength = 0.0
    config.optim.iterations = 100
    config.network.psiformer.num_layers = 1
    config.network.psiformer.num_heads = 1
    config.network.psiformer.heads_dim = 4
    config.batch_size = 64
    config.mcmc.burn_in = 50
    config.log.initial_energy = False
    return config


def test_training(simple_config: Config, tmp_path: Path, capsys: CaptureFixture[str]):
    simple_config.log.save_path = str(tmp_path)
    train(simple_config)
    assert (tmp_path / "train_stats.csv").exists()
    assert (tmp_path / "ckpt_000099.npz").exists()

    captured = capsys.readouterr()
    # Energy oscillates around the exact LLL value 1.5
    assert "energy=1.5" in captured.err
    assert "energy=1.4" in captured.err


def test_checkpoint(simple_config: Config, tmp_path: Path, capsys: CaptureFixture[str]):
    simple_config.optim.iterations = 1
    simple_config.mcmc.burn_in = 5
    simple_config.log.save_path = str(tmp_path)
    train(simple_config)
    assert (tmp_path / "ckpt_000000.npz").exists()

    simple_config.optim.iterations = 2
    train(simple_config)
    assert (tmp_path / "ckpt_000001.npz").exists()

    captured = capsys.readouterr()
    assert "Restored checkpoint" in captured.err

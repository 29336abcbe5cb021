"""Checkpoint format tests: roundtrip, corrupt-file fallback, format contract."""

import numpy as np
import pytest

from deephall_tpu.config import Config
from deephall_tpu.log import LogManager
from deephall_tpu.types import CheckpointState


@pytest.fixture
def manager(tmp_path):
    cfg = Config()
    cfg.log.save_path = str(tmp_path)
    return LogManager(cfg), tmp_path


def _state():
    params = {"params": {"Dense_0": {"kernel": np.ones((3, 4), np.float32)}}}
    data = np.zeros((16, 3, 2), np.float32)
    opt_state = {"m": np.zeros(5), "step": np.int32(7)}
    return CheckpointState(params, data, opt_state, np.float32(0.123))


def test_roundtrip(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(12, _state())
    assert (tmp_path / "ckpt_000012.npz").exists()
    step, state = mgr.try_restore_checkpoint()
    assert step == 13
    assert np.allclose(
        state.params["params"]["Dense_0"]["kernel"], np.ones((3, 4))
    )
    assert state.data.shape == (16, 3, 2)
    assert state.opt_state["step"] == 7
    assert float(state.mcmc_width) == pytest.approx(0.123)


def test_format_contract(manager):
    """Keys and layout must match the reference npz contract (SURVEY §5)."""
    mgr, tmp_path = manager
    mgr.save_checkpoint(3, _state())
    with np.load(tmp_path / "ckpt_000003.npz", allow_pickle=True) as f:
        assert set(f.files) == {"step", "params", "data", "opt_state", "mcmc_width"}
        assert int(f["step"]) == 3
        assert isinstance(f["params"].tolist(), dict)
        assert f["data"].ndim == 3
        assert f["mcmc_width"].shape == ()


def test_corrupt_fallback(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    (tmp_path / "ckpt_000010.npz").write_bytes(b"this is not a checkpoint")
    step, _ = mgr.try_restore_checkpoint()
    assert step == 6  # fell back to the good one


def test_newest_first(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    mgr.save_checkpoint(9, _state())
    step, _ = mgr.try_restore_checkpoint()
    assert step == 10


def test_restore_specific_file(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    step, state = LogManager.restore_checkpoint(str(tmp_path / "ckpt_000005.npz"))
    assert step == 6


def test_device_axis_folding(manager):
    """Old multi-device layouts with a leading device axis fold back into batch."""
    mgr, tmp_path = manager
    state = _state()._replace(data=np.zeros((4, 4, 3, 2), np.float32))
    path = tmp_path / "ckpt_000001.npz"
    with open(path, "wb") as f:
        np.savez_compressed(
            f, step=1, params=np.empty((), object), data=state.data,
            opt_state=np.empty((), object), mcmc_width=np.float32(0.1),
        )
    _, restored = LogManager.restore_checkpoint(str(path))
    assert restored.data.shape == (16, 3, 2)

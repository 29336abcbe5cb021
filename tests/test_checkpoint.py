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
    step, state, adapt = mgr.try_restore_checkpoint()
    assert step == 13
    assert np.allclose(
        state.params["params"]["Dense_0"]["kernel"], np.ones((3, 4))
    )
    assert state.data.shape == (16, 3, 2)
    assert state.opt_state["step"] == 7
    assert float(state.mcmc_width) == pytest.approx(0.123)
    assert adapt == {}


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


def test_adapt_state_roundtrip(manager):
    """Width-adaptation extras roundtrip and stay out of the reference key set."""
    mgr, tmp_path = manager
    pmoves = np.linspace(0, 1, 100, dtype=np.float32)
    mgr.save_checkpoint(4, _state(), adapt={"pmoves": pmoves, "t": np.int32(37)})
    with np.load(tmp_path / "ckpt_000004.npz", allow_pickle=True) as f:
        # Reference keys all present; extras additive only.
        assert {"step", "params", "data", "opt_state", "mcmc_width"} <= set(f.files)
    step, _, adapt = mgr.try_restore_checkpoint()
    assert step == 5
    assert np.allclose(adapt["pmoves"], pmoves)
    assert int(adapt["t"]) == 37


def test_corrupt_fallback(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    (tmp_path / "ckpt_000010.npz").write_bytes(b"this is not a checkpoint")
    step, _, _ = mgr.try_restore_checkpoint()
    assert step == 6  # fell back to the good one


def test_newest_first(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    mgr.save_checkpoint(9, _state())
    step, _, _ = mgr.try_restore_checkpoint()
    assert step == 10


def test_restore_specific_file(manager):
    mgr, tmp_path = manager
    mgr.save_checkpoint(5, _state())
    step, state, _ = LogManager.restore_checkpoint(str(tmp_path / "ckpt_000005.npz"))
    assert step == 6


def test_reference_checkpoint_cross_load(tmp_path):
    """A reference-produced artifact restores and training resumes from it.

    Builds an ``.npz`` the way the reference writes one (log.py:174-216): ``params``
    is a pickled flax FrozenDict with the reference's auto-generated module names,
    ``opt_state`` is an opaque pickled object whose class is *not importable* at load
    time (standing in for a kfac_jax blob), ``data`` is the flattened walker array and
    ``mcmc_width`` a numpy scalar.  Restore must recover params/data/width, drop the
    opt_state, and a 1-iteration training run must resume from it end to end.
    """
    import sys
    import types as pytypes

    import jax
    import jax.numpy as jnp
    from flax.core import freeze

    from deephall_tpu import train
    from deephall_tpu.networks import make_network

    cfg = Config()
    cfg.seed = 1
    cfg.batch_size = 32
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 2
    cfg.system.interaction_strength = 0.0
    cfg.network.psiformer.num_layers = 1
    cfg.network.psiformer.num_heads = 1
    cfg.network.psiformer.heads_dim = 4
    cfg.mcmc.burn_in = 0
    cfg.optim.iterations = 1
    cfg.log.initial_energy = False
    cfg.log.save_path = str(tmp_path)

    # Reference-named parameter tree (the naming parity is a framework invariant),
    # wrapped in a FrozenDict as older flax versions pickle it.
    model = make_network(cfg.system, cfg.network)
    params = freeze(jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((3, 2))))

    # An opt_state whose pickled class exists at save time but not at load time.
    fake_mod = pytypes.ModuleType("kfac_jax_stub_for_test")

    class OptBlob:  # noqa: D401 - stand-in for a kfac_jax state object
        pass

    OptBlob.__module__ = fake_mod.__name__
    OptBlob.__qualname__ = "OptBlob"
    fake_mod.OptBlob = OptBlob
    sys.modules[fake_mod.__name__] = OptBlob_module = fake_mod
    try:
        rng = np.random.default_rng(0)
        data = np.stack(
            [
                np.arccos(rng.uniform(-1, 1, (cfg.batch_size, 3))),
                rng.uniform(-np.pi, np.pi, (cfg.batch_size, 3)),
            ],
            axis=-1,
        ).astype(np.float32)
        with open(tmp_path / "ckpt_000007.npz", "wb") as f:
            np.savez_compressed(
                f,
                step=7,
                params=_obj(params),
                data=data,
                opt_state=_obj(OptBlob()),
                mcmc_width=np.float32(0.3),
            )
    finally:
        del sys.modules[OptBlob_module.__name__]

    step, state, adapt = LogManager.restore_checkpoint(
        str(tmp_path / "ckpt_000007.npz")
    )
    assert step == 8
    assert state.opt_state is None  # unpicklable blob dropped
    assert float(state.mcmc_width) == pytest.approx(0.3)
    assert adapt == {}
    kernel = state.params["params"]["PsiformerLayers_0"]["Dense_0"]["kernel"]
    assert kernel.shape[-1] == 4

    # End to end: the driver restores this artifact and trains one more step.
    cfg.optim.iterations = 9
    train(cfg)
    assert (tmp_path / "ckpt_000008.npz").exists()


def _obj(value):
    arr = np.empty((), object)
    arr[()] = value
    return arr


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
    _, restored, _ = LogManager.restore_checkpoint(str(path))
    assert restored.data.shape == (16, 3, 2)


def test_fsspec_memory_roundtrip():
    """Full artifact cycle through the AnyPath URL branch (log.py fsspec paths).

    Exercises the remote-checkpointing capability (reference parity:
    UPath-everywhere, /root/reference/deephall/log.py:180-216) end-to-end on the
    fsspec 'memory://' filesystem: run-dir creation, config.yml audit write,
    CSV stats append + force_flush, checkpoint save, newest-first glob restore.
    """
    import fsspec

    from deephall_tpu.log import AnyPath

    fs = fsspec.filesystem("memory")
    url = "memory://deephall_test_run"
    try:
        cfg = Config()
        cfg.log.save_path = url
        mgr = LogManager(cfg)

        # config.yml audit file went through the URL branch.
        assert (AnyPath(url) / "config.yml").is_file()
        with (AnyPath(url) / "config.yml").open() as f:
            assert "flux: 2" in f.read()

        # CSV writer: header, append, force_flush (close/reopen "a" on fsspec).
        with mgr.create_writer() as writer:
            writer.log(step="0", energy="1.5")
            writer.force_flush()
            writer.log(step="1", energy="1.4")
        with (AnyPath(url) / "train_stats.csv").open() as f:
            assert f.read().splitlines() == ["step,energy", "0,1.5", "1,1.4"]

        # Checkpoints: save two, restore picks the newest, contents intact.
        mgr.save_checkpoint(7, _state())
        mgr.save_checkpoint(12, _state())
        step, state, adapt = mgr.try_restore_checkpoint()
        assert step == 13
        assert np.allclose(
            state.params["params"]["Dense_0"]["kernel"], np.ones((3, 4))
        )
        assert state.data.shape == (16, 3, 2)
        assert float(state.mcmc_width) == pytest.approx(0.123)
        assert adapt == {}
    finally:
        if fs.exists("/deephall_test_run"):
            fs.rm("/deephall_test_run", recursive=True)

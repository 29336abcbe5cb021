"""End-to-end observable runner: train -> checkpoint -> restore -> estimate."""

import numpy as np

from deephall_tpu import Config, train
from deephall_tpu.observables import evaluate_observable, load_run
from deephall_tpu.observables.runner import cli


def test_runner_on_trained_checkpoint(tmp_path, capsys):
    cfg = Config()
    cfg.seed = 11
    cfg.system.nspins = (3, 0)
    cfg.system.flux = 6
    cfg.network.type = "laughlin"
    cfg.batch_size = 64
    cfg.mcmc.burn_in = 10
    cfg.optim.iterations = 2
    cfg.optim.optimizer = "none"
    cfg.log.save_path = str(tmp_path)
    cfg.log.initial_energy = False
    train(cfg)

    ckpt = str(tmp_path / "ckpt_000001.npz")
    run = load_run(ckpt)
    loaded_cfg = run[0]
    assert loaded_cfg.system.flux == 6
    results = evaluate_observable(*run, "overlap", steps=2)
    assert np.allclose(results["overlap"], 1.0, atol=1e-4)

    # CLI path
    out_file = tmp_path / "density.npz"
    cli([ckpt, "--estimator", "density", "--steps", "2", "--out", str(out_file)])
    with np.load(out_file) as f:
        assert f["map"].sum() == 2 * 64 * 3

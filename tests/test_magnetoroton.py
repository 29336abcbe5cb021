"""Magnetoroton driver: sector/chain orchestration with a stubbed train().

The real physics (penalties, overlap gradients, ED agreement) is covered by
``tests/test_excited.py``; here the driver's config plumbing is pinned — sector
targeting, chained orthogonal states, dotlist overrides, dispersion CSV.
"""

import csv
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import magnetoroton  # noqa: E402

from deephall_tpu.config import Config, to_dict  # noqa: E402


def _fake_stats(
    path: Path, energy: float, last_step: int = 10, l_square: float = 12.0,
    lz: float = 2.0,
):
    """Append rows ending at ``last_step`` (StatsWriter appends across phases)."""
    rows = [
        {
            "step": i,
            "energy": energy,
            "variance": 0.01,
            "L_square": l_square,
            "Lz": lz,
            "overlap": 0.01,
        }
        for i in range(max(0, last_step - 10), last_step)
    ]
    exists = path.exists()
    with open(path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        if not exists:
            writer.writeheader()
        writer.writerows(rows)


def test_sector_chain_configs_and_dispersion(tmp_path, monkeypatch):
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0 + 0.1 * len(seen),
                    last_step=cfg.optim.iterations)
        np.savez(run_dir / "ckpt_000099.npz", step=99)

    # The package re-exports the train *function* as deephall_tpu.train, so the
    # dotted-string form would resolve to the function; patch the module itself.
    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)

    out = tmp_path / "roton"
    magnetoroton.main(
        [
            "--config", str(config_yml),
            "--out", str(out),
            "--sectors", "2", "3",
            "--chain", "1",
            "--iterations", "123",
            "--restore", str(ground),
            "--selector", "window",  # legacy two-sided assertions below
            "--l2-penalty", "0.4",
            "--tail", "5",
            "--l2-tol", "0",  # purity rail covered by test_l2_purity_rail
            "--dotlist", "batch_size=512",
        ]
    )

    # 2 sectors x (two-stage level 0 + 1 chained) runs, in order.
    assert len(seen) == 6
    escape, purify, chained, second, second_purify, second_chained = seen
    # Stage A escapes with the Lz penalty alone; stage B adds the L^2 selector.
    assert escape.system.lz_center == 2.0
    assert escape.system.lz_penalty == 4.0  # strong symmetry-breaking kick
    assert escape.system.l2_penalty == 0.0
    assert escape.seed == base_cfg.seed + 101 * 2  # decorrelated per sector
    assert escape.system.orthogonal_states == (str(ground),)  # anti-fall-back rail
    # Warm start from the ground checkpoint (step 49 -> 50 done already).
    assert escape.log.restore_path == str(ground)
    assert escape.optim.iterations == 50 + 61  # half the budget
    assert escape.batch_size == 512
    assert escape.system.flux == 15 and escape.system.nspins == (6, 0)
    # The requested 0.4 exceeds the m=2 stability window (k < lz_penalty/2m);
    # the driver clamps to 0.8 * 1.0 / (2*2) so the run cannot tunnel into
    # the L=1 sector.
    assert purify.system.l2_penalty == 0.2
    assert purify.system.lz_penalty == 1.0
    assert purify.optim.iterations == 50 + 123
    assert purify.log.save_path == escape.log.save_path
    # Phase 2 resumes its own save dir; an explicit restore_path would rewind
    # to the ground checkpoint (LogManager gives it precedence).
    assert purify.log.restore_path is None
    # The chained run warm-starts from and is orthogonal to the first state.
    assert chained.system.lz_center == 2.0
    assert chained.system.l2_penalty == 0.0
    assert chained.system.orthogonal_states == (
        str(ground),
        str(out / "sector_2" / "ckpt_000099.npz"),
    )
    assert chained.log.restore_path == str(out / "sector_2" / "ckpt_000099.npz")
    assert chained.optim.iterations == 100 + 123
    assert second.system.lz_center == 3.0
    assert second.system.orthogonal_states == (str(ground),)
    assert second_purify.system.l2_penalty == 0.8 / 6  # m=3 window clamp
    assert second_chained.system.orthogonal_states == (
        str(ground),
        str(out / "sector_3" / "ckpt_000099.npz"),
    )

    with open(out / "dispersion.csv") as f:
        rows = list(csv.DictReader(f))
    assert [(r["sector"], r["level"]) for r in rows] == [
        ("2", "0"), ("2", "1"), ("3", "0"), ("3", "1")
    ]
    assert float(rows[0]["energy"]) == 7.2  # stats of the stage-B (purify) run
    assert "overlap" in rows[0]
    # Level-0 rows carry the exact ED anchor for the L=m sector member
    # (the production N=6, 2Q=15 blocks are dense-feasible); the exact L=2
    # magnetoroton energy is E0 + 0.1317 (BASELINE.md spectra).
    assert rows[0]["ed_l2"] != "" and abs(float(rows[0]["ed_l2"]) - 6.0) < 1e-6
    assert abs(float(rows[0]["ed_energy"]) - (6.87163 + 0.1317)) < 2e-4
    assert rows[1]["ed_energy"] == ""  # chained levels have no selector anchor


def _ed_settle_k(m: int, lz_penalty: float = 1.0) -> float:
    """The driver's ED-informed settle stiffness, rebuilt from first principles.

    Mirrors the closure ``ed_sector_info`` in scripts/magnetoroton.py: the
    exact ``Lz = m`` block of the production N=6, 2Q=15 system anchors the
    ``L = m`` member, and ``settle_k_from_ed`` turns the block's sub-target
    margins into the settle-stage selector strength.
    """
    if m not in _ed_settle_k.cache:
        from deephall_tpu.observables import ed

        result = ed.ed_block(6, 15, interaction="coulomb", two_lz=2 * m,
                             num_states=8)
        l2s = [ed.state_l2(result, 15, k)
               for k in range(len(result.energies))]
        totals = [3.0 + float(e) for e in result.energies]
        target = next(k for k, l2 in enumerate(l2s)
                      if abs(l2 - m * (m + 1)) < 0.5)
        _ed_settle_k.cache[m] = magnetoroton.settle_k_from_ed(
            totals, l2s, target, m, lz_penalty)
    return _ed_settle_k.cache[m]


_ed_settle_k.cache = {}


def test_l2_purity_rail(tmp_path, monkeypatch):
    """Impure settle tails extend the sector (burst + re-settle) until pure."""
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    # Per-call tail L^2: escape (ignored), impure settle, burst (ignored),
    # converged re-settle.
    l_squares = [12.0, 6.4, 6.3, 6.02]
    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations,
                    l_square=l_squares[len(seen) - 1])
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)
    out = tmp_path / "roton"
    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "2", "--iterations", "100",
        "--restore", str(ground), "--tail", "5",
        "--selector", "window",  # legacy two-sided plan pinned below
    ])

    # escape + settle + one extension (stiff burst then a fresh settle leg —
    # sector 2's L=2 member is NOT its block ground state, so an impure tail
    # bursts before re-settling).
    assert len(seen) == 4
    escape, settle, burst, resettle = seen
    assert settle.optim.iterations == 50 + 100
    assert settle.system.l2_penalty == 0.1  # window default, inside the clamp
    # Extension legs run at the ED-informed gentle stiffness: the exact Lz=2
    # block margins give k ~ 0.055 for N=6 (10x the beat-the-contaminant
    # requirement, well inside the 0.2 tunneling window).
    k_ed = _ed_settle_k(2)
    assert 0.02 < k_ed < 0.2
    assert burst.optim.iterations == 150 + 12  # iterations // 8 burst
    assert abs(burst.system.l2_penalty - k_ed) < 1e-12
    assert resettle.optim.iterations == 162 + 25  # iterations // 4 settle ext
    assert abs(resettle.system.l2_penalty - k_ed) < 1e-12
    assert resettle.system.lz_penalty == 1.0  # nominal, not the escape kick
    assert resettle.log.restore_path is None  # resumes its own run
    with open(out / "dispersion.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert rows[0]["status"] == "ok"
    # The dispersion point comes from the re-settle tail, not the impure one.
    assert abs(float(rows[0]["L_square"]) - 6.02) < 1e-9


def test_relaunch_resumes_own_run_and_skips_done(tmp_path, monkeypatch):
    """Re-launching over an existing --out must not rewind to the ground ckpt."""
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations, l_square=6.0)
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)
    out = tmp_path / "roton"

    # A previous launch died mid-purify: escape done (target 100), step 120.
    run_dir = out / "sector_2"
    run_dir.mkdir(parents=True)
    np.savez(run_dir / "ckpt_000120.npz", step=120)
    _fake_stats(run_dir / "train_stats.csv", energy=7.0, last_step=121,
                l_square=6.0)

    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "2", "--iterations", "100",
        "--restore", str(ground), "--tail", "5", "--l2-tol", "0",
    ])
    # Escape (target 80) and purify (target 110) predate the resume point
    # (step 121); only the settle phase runs, resuming the run's own ckpts
    # at the ED-informed gentle selector (settle_k_from_ed on the exact
    # Lz=2 block — ~0.055, well inside the 0.2 tunneling window).
    assert len(seen) == 1
    assert seen[0].log.restore_path is None
    assert seen[0].optim.iterations == 150
    assert abs(seen[0].system.l2_penalty - _ed_settle_k(2)) < 1e-12
    assert seen[0].system.lz_penalty == 1.0
    assert seen[0].system.l2_center == 6.0  # floored at the L=2 multiplet

    # Second re-launch: the sector row is already in dispersion.csv -> no-op.
    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "2", "--iterations", "100",
        "--restore", str(ground), "--tail", "5", "--l2-tol", "0",
    ])
    assert len(seen) == 1
    with open(out / "dispersion.csv") as f:
        assert len(list(csv.DictReader(f))) == 1


def test_dispersion_report_merge():
    """dispersion_report.report: gaps, purity, ED deviation, chained rows skipped."""
    import dispersion_report

    rows = [
        {"sector": "3", "level": "0", "energy": "3.9582", "energy_err": "0.0003",
         "L_square": "12.15", "ed_energy": "3.96467"},
        {"sector": "3", "level": "1", "energy": "4.1", "energy_err": "0.001",
         "L_square": "12.0", "ed_energy": ""},  # chained: skipped
        {"sector": "2", "level": "0", "energy": "4.0069", "energy_err": "0.0003",
         "L_square": "6.30", "ed_energy": "4.00300"},
    ]
    entries = dispersion_report.report(rows, e0_vmc=3.8708, e0_err=0.0001)
    assert [e["L"] for e in entries] == [2, 3]
    l2, l3 = entries
    assert abs(l3["gap_vmc"] - (3.9582 - 3.8708)) < 1e-12
    assert abs(l3["purity"] - 0.15) < 1e-9
    assert l3["dev_sigma"] < 0  # VMC below the exact LLL energy (LL mixing)
    assert l2["dev_sigma"] > 0  # impure sector sits above its ED target


def test_tail_stats_drops_node_crossing_spikes(tmp_path):
    """One spike row must not corrupt the tail point or the purity rail.

    Measured failure (runs/roton13 sector 2): a single node-crossing row with
    L^2 ~ 6e5 pushed the crude window mean to L^2 = 1268 vs the robust 9.6,
    so the rail read a converged-looking stage as wildly impure. The energy-
    median window mask must drop such rows from every reported column.
    """
    path = tmp_path / "train_stats.csv"
    rows = []
    for i in range(100):
        rows.append({"step": i, "energy": 7.10 + 0.001 * (i % 3),
                     "variance": 0.2, "L_square": 6.01, "Lz": 2.0,
                     "overlap": 0.001})
    rows[57] = {"step": 57, "energy": 3.2e4, "variance": 1e12,
                "L_square": 6.3e5, "Lz": 2.0, "overlap": 0.9}
    # Near-pole walker: finite (normal) energy but NaN L^2 — older CSVs log
    # observables with a plain mean, so such rows exist (runs/roton13
    # sector 3 had 6 in 3000); the per-column finite mask must drop them.
    rows[71] = {"step": 71, "energy": 7.101, "variance": 0.2,
                "L_square": float("nan"), "Lz": 2.0, "overlap": 0.001}
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)

    stats = magnetoroton.tail_stats(path, rows=100)
    assert abs(stats["L_square"] - 6.01) < 1e-6
    assert abs(stats["energy"] - 7.101) < 0.01
    assert stats["variance"] < 1.0  # median, not spike-dominated mean
    assert stats["overlap"] < 0.01
    assert stats["energy_err"] < 0.001


def test_dispersion_report_rebuild(tmp_path):
    """--rebuild recomputes rows from the sector CSVs (final-tail windows)."""
    import dispersion_report

    out = tmp_path / "roton"
    for m, (energy, l2) in {2: (7.002, 6.02), 4: (6.954, 20.04)}.items():
        d = out / f"sector_{m}"
        d.mkdir(parents=True)
        _fake_stats(d / "train_stats.csv", energy=5.0, last_step=50,
                    l_square=999.0)  # escape-phase rows: must be excluded
        _fake_stats(d / "train_stats.csv", energy=energy, last_step=100,
                    l_square=l2)
    # A chained higher-band run must be ignored by the rebuild glob.
    chained = out / "sector_2_state1"
    chained.mkdir()
    _fake_stats(chained / "train_stats.csv", energy=7.2, last_step=100)

    rows = dispersion_report.rebuild_rows(out, tail=10)
    assert [r["sector"] for r in rows] == [2, 4]
    assert abs(rows[0]["energy"] - 7.002) < 1e-9
    assert abs(rows[0]["L_square"] - 6.02) < 1e-9
    assert abs(rows[1]["L_square"] - 20.04) < 1e-9

    entries = dispersion_report.report(
        [{k: str(v) for k, v in r.items()} for r in rows],
        e0_vmc=6.868, e0_err=1e-4,
    )
    assert [e["L"] for e in entries] == [2, 4]
    assert abs(entries[1]["gap_vmc"] - (6.954 - 6.868)) < 1e-9


def test_rail_extends_from_resumed_step_beyond_plan(tmp_path, monkeypatch):
    """Extensions of a run resumed beyond its planned target must train.

    Re-launching with a smaller --iterations over an already-extended sector
    plans phase targets below the restored step; the rail's extension targets
    must build on the resume point or every extension train() call no-ops
    below the checkpoint's iteration counter and the rail spins without
    training.
    """
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations, l_square=6.01)
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)
    out = tmp_path / "roton"
    # Pre-populate sector 2 as an extended run at step 399 — far beyond the
    # new plan's final target 50 + 100 = 150 — with an impure tail.
    sector = out / "sector_2"
    sector.mkdir(parents=True)
    _fake_stats(sector / "train_stats.csv", energy=7.0, last_step=400,
                l_square=9.0)
    np.savez(sector / "ckpt_000399.npz", step=399)

    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "2", "--iterations", "100",
        "--restore", str(ground), "--tail", "5",
    ])

    # All planned phases predate the resume; a fresh settle leg trains from
    # the resume point (400 + the plan's settle length 40) at the gentle
    # ED-informed selector, and its converged tail lands the row.
    assert len(seen) == 1
    assert seen[0].optim.iterations == 400 + 40
    assert abs(seen[0].system.l2_penalty - _ed_settle_k(2)) < 1e-12
    assert seen[0].system.lz_penalty == 1.0
    assert seen[0].log.restore_path is None


def test_nan_abort_retry_and_sector_isolation(tmp_path, monkeypatch):
    """NaN aborts retry with halved penalties; a persistent one skips the sector.

    Measured in the N=6 sweep: the 4x escape kick at m=4 diverged to NaN,
    train() saved the blown-up state and raised SystemExit, and the abort
    killed sectors 5/6 of the sweep. The driver must drop the poisoned
    checkpoint, halve both penalty scalars, and resume; a sector that keeps
    diverging is abandoned without killing the sweep.
    """
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    good = np.array({"w": np.array([1.0])}, dtype=object)
    bad = np.array({"w": np.array([np.nan])}, dtype=object)
    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        if "sector_4" in cfg.log.save_path:
            # Every sector-4 attempt diverges: NaN state saved, then abort.
            np.savez(run_dir / f"ckpt_{60 + len(seen):06d}.npz",
                     step=60 + len(seen), params=bad)
            raise SystemExit("=" * 30 + " ABORT " + "=" * 30)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations, l_square=30.0)
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1, params=good)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49, params=good)
    out = tmp_path / "roton"
    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "4", "5", "--iterations", "100",
        "--restore", str(ground), "--tail", "5", "--l2-tol", "0",
    ])

    s4 = [c for c in seen if "sector_4" in c.log.save_path]
    s5 = [c for c in seen if "sector_5" in c.log.save_path]
    # Three sector-4 attempts (escape + 2 retries), kick halved each time
    # from the capped escape_kick(1, 4) = 36/16.
    assert [c.system.lz_penalty for c in s4] == [2.25, 1.125, 0.5625]
    # Poisoned checkpoints were dropped each time; the retries re-restore
    # the ground warm start rather than resuming a NaN state.
    assert all(c.log.restore_path == str(ground) for c in s4)
    assert not list((out / "sector_4").glob("ckpt_*.npz"))
    # The sweep continued: sector 5 ran (escape + purify + settle), row landed.
    assert len(s5) == 3
    with open(out / "dispersion.csv") as f:
        rows = list(csv.DictReader(f))
    assert [(r["sector"], r["level"]) for r in rows] == [("5", "0")]


def test_adaptive_selector_plan(tmp_path, monkeypatch):
    """Adaptive selector: escape + annealing purify + FIXED-gentle settle.

    The stiffness schedule lives in-graph (config.System.l2_adaptive:
    k_eff = k * clip(<L^2> - c, 0, 1) with the Lz penalty raised to track
    the tunneling window) and carries escape + purify — but the adaptive
    leg's equilibrium impurity scales as 1/k_eff, so it never reaches the
    gentle regime (round 4: sector 4 plateaued at L^2 = 20.24 under
    lz_eff ~ 6). The dispersion row is therefore measured on a fixed
    ED-informed settle leg, and an impure tail gets an adaptive burst
    followed by a fresh gentle settle leg.
    """
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    # escape (ignored), purify (ignored), impure settle, burst (ignored),
    # converged re-settle
    l_squares = [40.0, 12.0, 6.4, 6.3, 6.02]
    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations,
                    l_square=l_squares[len(seen) - 1])
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)
    out = tmp_path / "roton"
    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "2", "--iterations", "100",
        "--restore", str(ground), "--tail", "5",
        "--selector", "adaptive",
    ])

    assert len(seen) == 5
    escape, purify, settle, burst, resettle = seen
    # Escape: capped kick (1.0 * min(4, 36/4) = 4 at m=2), selector clamped
    # to the kick's window 0.8 * 4 / (2*2) = 0.8, adaptive flag threaded.
    assert escape.system.lz_penalty == 4.0
    assert abs(escape.system.l2_penalty - 0.8) < 1e-12
    assert escape.system.l2_center == 6.0
    assert escape.system.l2_adaptive is True
    assert escape.optim.iterations == 50 + 30
    # Purify at the full adaptive cap (default k = 2.0), nominal lz — the
    # in-graph annealing handles the stiffness ladder.
    assert purify.system.l2_penalty == 2.0
    assert purify.system.lz_penalty == 1.0
    assert purify.system.l2_adaptive is True
    assert purify.optim.iterations == 50 + 60
    # The row is measured on a FIXED gentle settle leg (ED-informed k,
    # adaptive off): the adaptive leg never reaches the gentle regime.
    k_ed = _ed_settle_k(2)
    assert abs(settle.system.l2_penalty - k_ed) < 1e-12
    assert settle.system.lz_penalty == 1.0
    assert settle.system.l2_adaptive is False
    assert settle.optim.iterations == 50 + 100
    # Impure tail -> one adaptive burst + a fresh gentle settle leg.
    assert burst.system.l2_penalty == 2.0
    assert burst.system.lz_penalty == 1.0
    assert burst.system.l2_adaptive is True
    assert burst.optim.iterations == 150 + 12
    assert abs(resettle.system.l2_penalty - k_ed) < 1e-12
    assert resettle.system.l2_adaptive is False
    assert resettle.optim.iterations == 162 + 25

    with open(out / "dispersion.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and abs(float(rows[0]["L_square"]) - 6.02) < 1e-9


def test_onesided_selector_plan(tmp_path, monkeypatch):
    """Default selector: escape kick, stiff-lz purify, gentle settle, bursts.

    At m=5 the two-sided window would clamp k to 0.8/(2*5) = 0.08; the
    one-sided floor (l2_center = 30) keeps the full k through the purify
    stage by raising the Lz penalty to 3*k*m (unbiased at the in-sector
    target, where the Lz penalty vanishes exactly — measured: clamping k
    instead rotates ~30x slower, and the bare floor at nominal lz tunneled).
    The escape kick is capped so kick * m^2 <= 36 (m=4 at 64 measured NaN),
    and the escape-stage selector is clamped to the kick's own window.  The
    dispersion row comes from the final *settle* stage (window-clamped k at
    the nominal lz — stiff stages wreck the energy, measured in the N=6
    sweep), and rail extensions are capped purify bursts + settle re-legs.
    """
    base_cfg = Config()
    base_cfg.system.flux = 15
    base_cfg.system.nspins = (6, 0)
    config_yml = tmp_path / "config.yml"
    config_yml.write_text(yaml.safe_dump(to_dict(base_cfg)))

    # escape, purify, settle (impure), rail burst, rail settle (converged)
    l_squares = [40.0, 31.0, 30.6, 30.2, 30.01]
    seen: list[Config] = []

    def fake_train(cfg: Config):
        seen.append(cfg)
        run_dir = Path(cfg.log.save_path)
        run_dir.mkdir(parents=True, exist_ok=True)
        _fake_stats(run_dir / "train_stats.csv", energy=7.0,
                    last_step=cfg.optim.iterations,
                    l_square=l_squares[len(seen) - 1], lz=5.0)
        np.savez(run_dir / f"ckpt_{cfg.optim.iterations - 1:06d}.npz",
                 step=cfg.optim.iterations - 1)

    import importlib

    train_module = importlib.import_module("deephall_tpu.train")
    monkeypatch.setattr(train_module, "train", fake_train)

    ground = tmp_path / "ground_ckpt_000049.npz"
    np.savez(ground, step=49)
    out = tmp_path / "roton"
    magnetoroton.main([
        "--config", str(config_yml), "--out", str(out),
        "--sectors", "5", "--iterations", "100",
        "--restore", str(ground), "--tail", "5",
    ])

    assert len(seen) == 5
    escape, purify, settle, burst, resettle = seen
    # Escape kick capped at kick * m^2 = 36: 36/25 at m=5; the selector rides
    # through the escape (gated off at the ground) clamped to the kick's
    # stability window 0.8 * kick / (2m).
    assert abs(escape.system.lz_penalty - 36.0 / 25.0) < 1e-12
    assert abs(escape.system.l2_penalty - 0.8 * (36.0 / 25.0) / 10.0) < 1e-12
    assert escape.system.l2_center == 30.0
    assert escape.optim.iterations == 50 + 30  # 30% of the budget
    # The full default k survives at the outer sector, stabilized by the
    # stiff purify-stage Lz penalty 3*k*m = 15.
    assert purify.system.l2_penalty == 1.0
    assert purify.system.l2_center == 30.0
    assert purify.system.lz_penalty == 15.0
    assert purify.optim.iterations == 50 + 60
    # The settle stage measures the row at the ED-informed gentle selector:
    # sector 5's margins need no stiffness (every sub-target block state is
    # in-multiplet), so settle_k_from_ed returns the noise guard k = 0.02.
    k_ed = _ed_settle_k(5)
    assert abs(k_ed - 0.02) < 1e-12
    assert abs(settle.system.l2_penalty - k_ed) < 1e-12
    assert settle.system.lz_penalty == 1.0
    assert settle.system.l2_center == 30.0
    assert settle.optim.iterations == 50 + 100
    # Impure settle tail -> one capped stiff burst + a fresh settle leg.
    assert burst.system.l2_penalty == 1.0
    assert burst.system.lz_penalty == 15.0
    assert burst.optim.iterations == 150 + 12  # iterations // 8
    assert abs(resettle.system.l2_penalty - k_ed) < 1e-12
    assert resettle.system.lz_penalty == 1.0
    assert resettle.optim.iterations == 162 + 25  # iterations // 4

    with open(out / "dispersion.csv") as f:
        rows = list(csv.DictReader(f))
    # The row is the re-settle leg's tail, never burst rows.
    assert len(rows) == 1 and abs(float(rows[0]["L_square"]) - 30.01) < 1e-9

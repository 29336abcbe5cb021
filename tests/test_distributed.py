"""Multi-host initialisation smoke test: two real processes rendezvous on CPU.

``initialize_distributed`` must set up the coordinator *before* anything touches
the backend; each child process initialises, builds the global walker mesh over
both processes' devices, and runs one jitted cross-process reduction.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

CHILD = """
import os, sys
import jax
sys.path.insert(0, {repo!r})
from deephall_tpu import parallel

parallel.initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = parallel.get_mesh()
assert len(mesh.devices.flatten()) == 2
spec = NamedSharding(mesh, P(parallel.DATA_AXIS))
# Each process contributes its own index; the global sum must see both.
arr = jax.make_array_from_callback(
    (2,), spec, lambda idx: np.full((1,), jax.process_index(), np.float32)
)
total = float(jax.jit(jnp.sum)(arr))
assert total == 1.0, total
print("DISTRIBUTED_OK", jax.process_index(), flush=True)
"""


def test_two_process_rendezvous(tmp_path: Path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = str(Path(__file__).resolve().parent.parent)
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=repo))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out of children
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    outs = []
    for proc in procs:
        out, err = proc.communicate(timeout=300)
        outs.append((proc.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout={out}\nstderr={err}"
        assert "DISTRIBUTED_OK" in out


TRAIN_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import jax
from deephall_tpu.config import Config
from deephall_tpu.train import train

cfg = Config()
cfg.seed = 7
cfg.batch_size = 64
cfg.system.nspins = (3, 0)
cfg.system.flux = 2
cfg.system.interaction_strength = 0.0
cfg.network.psiformer.num_layers = 1
cfg.network.psiformer.num_heads = 1
cfg.network.psiformer.heads_dim = 4
cfg.mcmc.burn_in = 5
cfg.mcmc.steps = 2
cfg.optim.iterations = {iters}
cfg.optim.block_size = 3
cfg.log.initial_energy = False
cfg.log.save_path = {save!r}
train(cfg)
print("TRAIN_DONE", jax.process_index(), jax.process_count(), flush=True)
"""


def _spawn(script: Path, n_proc: int, port: int, extra_env=None):
    """Launch n_proc CPU processes running ``script``; return completed outputs."""
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        # Pin the full-precision sweep: cross-process bit-exact parity (the
        # assertion these tests make) holds for the f32 sampler, but the bf16
        # tower's acceptance bits depend on how each process's XLA compilation
        # associates its reductions — different process layouts then take
        # different (equally valid) Metropolis trajectories. bf16 correctness
        # over the mesh is covered in-process by test_mcmc's device-count
        # invariance test (tests/test_mcmc_bf16.py).
        env.update(JAX_PLATFORMS="cpu", DEEPHALL_MCMC_DTYPE="f32", **(extra_env or {}))
        if n_proc > 1:
            env.update(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES=str(n_proc),
                JAX_PROCESS_ID=str(pid),
            )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [(p.returncode, *p.communicate(timeout=600)) for p in procs]
    outs = [(p.returncode, o, e) for p, (_, o, e) in zip(procs, outs)]
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout={out}\nstderr={err}"
    return outs


def _energies(csv_path: Path) -> list[float]:
    lines = csv_path.read_text().splitlines()
    head = lines[0].split(",")
    col = head.index("energy")
    return [float(line.split(",")[col]) for line in lines[1:]]


def test_two_process_training_end_to_end(tmp_path: Path):
    """Full multi-host training loop: train, checkpoint, resume, single-host parity.

    Drives the exact code that a one-chip bench cannot: the cross-process
    checkpoint gather (``log.process_allgather`` on walker-sharded data), the
    process-0-only artifact ownership, and the restore placement of host arrays
    onto a 2-process sharding (``train.py`` device_put of restored state). The
    single-process run on a 2-virtual-device mesh must produce the same global
    statistics: SPMD programs are process-layout independent.
    """
    import numpy as np

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = str(Path(__file__).resolve().parent.parent)

    # Phase 1: two processes, 6 iterations, checkpoint written at the end.
    save2 = tmp_path / "two_proc"
    script = tmp_path / "train6.py"
    script.write_text(TRAIN_CHILD.format(repo=repo, iters=6, save=str(save2)))
    outs = _spawn(script, 2, port)
    assert all("TRAIN_DONE" in out for _, out, _ in outs)
    assert (save2 / "ckpt_000005.npz").exists()
    assert (save2 / "train_stats.csv").exists()
    # Only process 0 owns artifacts; the directory holds exactly one run's files.
    with np.load(save2 / "ckpt_000005.npz", allow_pickle=True) as f:
        # The gathered checkpoint holds the FULL global batch, not one host's shard.
        assert f["data"].shape == (64, 3, 2)

    # Phase 2: restart with more iterations; both processes restore from the
    # checkpoint (cross-process device_put) and continue to 12.
    script2 = tmp_path / "train12.py"
    script2.write_text(TRAIN_CHILD.format(repo=repo, iters=12, save=str(save2)))
    outs = _spawn(script2, 2, port + 1)
    assert all("TRAIN_DONE" in out for _, out, _ in outs)
    assert any("Restored checkpoint" in err for _, _, err in outs)
    assert (save2 / "ckpt_000011.npz").exists()
    energies2 = _energies(save2 / "train_stats.csv")
    assert len(energies2) == 12

    # Phase 3: single process, two virtual devices, same seed, 6 iterations
    # straight through. Global statistics must agree with the 2-process run.
    save1 = tmp_path / "one_proc"
    script3 = tmp_path / "train_single.py"
    script3.write_text(TRAIN_CHILD.format(repo=repo, iters=6, save=str(save1)))
    _spawn(
        script3, 1, 0,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )
    energies1 = _energies(save1 / "train_stats.csv")
    np.testing.assert_allclose(energies1, energies2[:6], rtol=1e-5, atol=1e-5)

    # Phase 4: hybrid topology — 2 processes x 2 virtual devices each (the
    # DCN-across-hosts x ICI-within-host layout of a real pod). The global
    # statistics must again be identical: the mesh is 1-D over all 4 devices
    # and sampling is device-count independent (partitionable threefry).
    save4 = tmp_path / "two_proc_two_dev"
    script4 = tmp_path / "train_hybrid.py"
    script4.write_text(TRAIN_CHILD.format(repo=repo, iters=6, save=str(save4)))
    outs = _spawn(
        script4, 2, port + 2,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )
    assert all("TRAIN_DONE 0 2" in out or "TRAIN_DONE 1 2" in out for _, out, _ in outs)
    with np.load(save4 / "ckpt_000005.npz", allow_pickle=True) as f:
        assert f["data"].shape == (64, 3, 2)
    energies4 = _energies(save4 / "train_stats.csv")
    np.testing.assert_allclose(energies4, energies2[:6], rtol=1e-5, atol=1e-5)


RUNNER_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import jax
from deephall_tpu.observables import runner

runner.cli([
    {ckpt!r}, "--estimator", "density", "--steps", "4", "--seed", "1",
    "--out", {out!r},
])
print("RUNNER_DONE", jax.process_index(), jax.process_count(), flush=True)
"""


def test_two_process_observables_runner(tmp_path: Path):
    """The analysis surface is multi-host too: the standalone runner restores a
    checkpoint, walks the chain on a 2-process global mesh, and process 0 alone
    writes the digest — which must equal the single-process result (sampling is
    device-count independent)."""
    import numpy as np

    repo = str(Path(__file__).resolve().parent.parent)

    # A tiny converged-enough checkpoint (single process).
    save = tmp_path / "train"
    script = tmp_path / "train3.py"
    script.write_text(TRAIN_CHILD.format(repo=repo, iters=3, save=str(save)))
    _spawn(script, 1, 0)
    ckpt = str(save / "ckpt_000002.npz")

    # Single-process reference digest.
    out1 = str(tmp_path / "density_1proc.npz")
    script1 = tmp_path / "runner1.py"
    script1.write_text(RUNNER_CHILD.format(repo=repo, ckpt=ckpt, out=out1))
    _spawn(script1, 1, 0)

    # Two processes, one global mesh.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out2 = str(tmp_path / "density_2proc.npz")
    script2 = tmp_path / "runner2.py"
    script2.write_text(RUNNER_CHILD.format(repo=repo, ckpt=ckpt, out=out2))
    outs = _spawn(script2, 2, port)
    assert any("RUNNER_DONE 0 2" in out for _, out, _ in outs)
    assert any("RUNNER_DONE 1 2" in out for _, out, _ in outs)
    # Only process 0 writes the artifact.
    saved_logs = [err for _, _, err in outs if "Saved" in err]
    assert len(saved_logs) == 1

    with np.load(out1) as a, np.load(out2) as b:
        np.testing.assert_allclose(a["map"], b["map"], rtol=1e-6, atol=1e-6)

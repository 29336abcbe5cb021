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

"""Run management: checkpoints, CSV stats, config audit.

Format parity with the reference (``/root/reference/deephall/log.py``):

* checkpoints ``ckpt_{step:06d}.npz`` (compressed) with keys ``step``, ``params``
  (pickled pytree), ``data`` ``[batch, nelec, 2]``, ``opt_state`` (pickled),
  ``mcmc_width`` scalar — and restore falls back across corrupt files, newest first;
* ``train_stats.csv`` with header-on-create and a mirrored human line on stderr;
* ``config.yml`` sidecar stamped with the git commit, with an ndiff against the
  restored run's config printed to stderr (reproducibility audit).

Because this framework has no leading device axis anywhere (global arrays on a mesh),
the reference's dedup/redup dance on save/load is the identity: checkpoints are
device-count portable by construction and byte-compatible with reference ones.  A
reference checkpoint's ``opt_state`` pickles kfac_jax objects; if it cannot be
unpickled the state is dropped and the optimizer reinitialised (params/data/width are
still restored).

Paths accept local filesystem paths or any ``scheme://`` fsspec URL.
"""

from __future__ import annotations

import datetime
import difflib
import logging
import subprocess
import sys
from collections.abc import Generator
from contextlib import contextmanager
from pathlib import Path

import jax
import numpy as np

from deephall_tpu.config import Config, to_yaml
from deephall_tpu.types import CheckpointState

logger = logging.getLogger("deephall")


class AnyPath:
    """Minimal local/fsspec path shim (the reference uses universal_pathlib)."""

    def __init__(self, path: str | Path | "AnyPath"):
        self._raw = str(path)
        self._is_url = "://" in self._raw

    def __str__(self) -> str:
        return self._raw

    def __truediv__(self, other: str) -> "AnyPath":
        sep = "" if self._raw.endswith("/") else "/"
        return AnyPath(f"{self._raw}{sep}{other}")

    def _fs(self):
        import fsspec

        fs, path = fsspec.core.url_to_fs(self._raw)
        return fs, path

    def exists(self) -> bool:
        if self._is_url:
            fs, p = self._fs()
            return fs.exists(p)
        return Path(self._raw).exists()

    def is_file(self) -> bool:
        if self._is_url:
            fs, p = self._fs()
            return fs.isfile(p)
        return Path(self._raw).is_file()

    def mkdir(self, parents: bool = True, exist_ok: bool = True) -> None:
        if self._is_url:
            fs, p = self._fs()
            fs.makedirs(p, exist_ok=exist_ok)
        else:
            Path(self._raw).mkdir(parents=parents, exist_ok=exist_ok)

    def glob(self, pattern: str) -> list["AnyPath"]:
        if self._is_url:
            fs, p = self._fs()
            proto = self._raw.split("://", 1)[0]
            return [AnyPath(f"{proto}://{m}") for m in fs.glob(f"{p}/{pattern}")]
        return [AnyPath(p) for p in Path(self._raw).glob(pattern)]

    def open(self, mode: str = "r", **kwargs):
        if self._is_url:
            import fsspec

            return fsspec.open(self._raw, mode, **kwargs).open()
        return open(self._raw, mode, **kwargs)

    def unlink(self, missing_ok: bool = True) -> None:
        if self._is_url:
            fs, p = self._fs()
            if fs.exists(p):
                fs.rm(p)
        else:
            Path(self._raw).unlink(missing_ok=missing_ok)

    @property
    def name(self) -> str:
        return self._raw.rstrip("/").rsplit("/", 1)[-1]


def init_logging() -> None:
    """Set up the ``deephall`` stderr logger."""
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    handler = logging.StreamHandler(sys.stderr)
    handler.setLevel(logging.INFO)
    logger.addHandler(handler)
    logger.propagate = False


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _object_array(value) -> np.ndarray:
    arr = np.empty((), dtype=object)
    arr[()] = value
    return arr


class StatsWriter:
    """CSV stats file with header-on-create, stderr mirroring and force-flush."""

    def __init__(self, stats_path: AnyPath):
        self.stats_path = stats_path
        self.stats_file = None
        self.hidden_fields: set[str] = set()

    def __enter__(self):
        exists = self.stats_path.exists()
        self.should_write_head = not exists or self._size() == 0
        self.stats_file = self.stats_path.open("a" if exists else "w", buffering=1)
        return self

    def _size(self) -> int:
        try:
            with self.stats_path.open("rb") as f:
                f.seek(0, 2)
                return f.tell()
        except OSError:
            return 0

    def hide(self, *args):
        """Hide these fields on stderr while still writing them to the CSV."""
        self.hidden_fields.update(args)

    def log(self, **kwargs):
        """Write the key-value pairs to the CSV and a human-readable stderr line."""
        if self.should_write_head:
            self.stats_file.write(",".join(kwargs.keys()) + "\n")
            self.should_write_head = False
        self.stats_file.write(",".join(kwargs.values()) + "\n")
        info = ", ".join(
            f"{k}={v}" for k, v in kwargs.items() if k not in self.hidden_fields
        )
        logger.info(info)

    def force_flush(self):
        """Close and reopen the file (reliable flush on remote filesystems)."""
        self.stats_file.close()
        self.stats_file = self.stats_path.open("a", buffering=1)

    def __exit__(self, exc_type, exc_value, traceback):
        self.stats_file.close()
        if self.should_write_head:
            self.stats_path.unlink(missing_ok=True)


class _NullWriter:
    """Stats sink for non-main processes in multi-host runs: accepts and drops."""

    def hide(self, *args) -> None:
        del args

    def log(self, **kwargs) -> None:
        del kwargs

    def force_flush(self) -> None:
        pass


class LogManager:
    """Save-dir lifecycle: auto-naming, config audit, checkpoint save/restore.

    With ``write_artifacts=False`` (non-main processes of a multi-host run) all
    restore paths work as usual but nothing is written: no run directory, no
    ``config.yml``, no checkpoints, and ``create_writer`` yields a null sink.
    """

    def __init__(self, cfg: Config, write_artifacts: bool = True):
        self.write_artifacts = write_artifacts
        if cfg.log.save_path is None:
            timestamp = datetime.datetime.now().strftime("%Y%m%d_%H:%M:%S")
            self.save_path = AnyPath(
                f"DeepHall_n{sum(cfg.system.nspins)}l{cfg.system.flux}_{timestamp}"
            )
        else:
            self.save_path = AnyPath(cfg.log.save_path)

        if cfg.log.restore_path is None:
            self.restore_path = self.save_path
        else:
            self.restore_path = AnyPath(cfg.log.restore_path)
            if not self.restore_path.exists():
                logger.warning("Restore path %s does not exist!", self.restore_path)

        if self.write_artifacts and not self.save_path.exists():
            self.save_path.mkdir(parents=True)

        self.check_config(cfg)

    def check_config(self, cfg: Config) -> None:
        """Save the current config, diffing against the restored run's config."""
        restore_config_path = self.restore_path / "config.yml"
        current_config_yaml = [f"git_commit: {get_git_commit()}\n"]
        current_config_yaml.extend(to_yaml(cfg).splitlines(keepends=True))

        if not self.write_artifacts:
            return
        if restore_config_path.exists():
            with restore_config_path.open() as f:
                original_config_yaml = f.readlines()
        else:
            original_config_yaml = []
        sys.stderr.writelines(difflib.ndiff(original_config_yaml, current_config_yaml))
        with (self.save_path / "config.yml").open("w") as f:
            f.writelines(current_config_yaml)

    def save_checkpoint(
        self, step: int, state: CheckpointState, adapt: dict | None = None
    ) -> None:
        """Save a checkpoint in the reference ``.npz`` format.

        Args:
            step: Global step index stored under the ``step`` key.
            state: Parameters, walkers, optimizer state and MCMC width.
            adapt: Optional width-adaptation state (``pmoves`` ring buffer and step
                counter ``t``), stored as extra keys — the reference loader reads by
                key and ignores them, so the on-disk contract is preserved.
        """
        if jax.process_count() > 1 and getattr(state.data, "is_fully_addressable", True) is False:
            # Walkers are sharded across hosts; fetching them directly would fail
            # (and 0-byte a checkpoint). Gather on every process — it is a
            # collective — then only the main process writes below.
            from jax.experimental import multihost_utils

            state = state._replace(
                data=multihost_utils.process_allgather(state.data, tiled=True)
            )
        if not self.write_artifacts:
            return
        ckpt_path = self.save_path / f"ckpt_{step:06d}.npz"
        logger.info("Saving checkpoint %s", ckpt_path)
        extras = {
            k: np.asarray(jax.device_get(v)) for k, v in (adapt or {}).items()
        }
        with ckpt_path.open("wb") as f:
            np.savez_compressed(
                f,
                step=step,
                params=_object_array(_to_numpy_tree(state.params)),
                data=np.asarray(jax.device_get(state.data)),
                opt_state=_object_array(_to_numpy_tree(state.opt_state)),
                mcmc_width=np.asarray(jax.device_get(state.mcmc_width)).reshape(()),
                **extras,
            )

    def try_restore_checkpoint(
        self,
    ) -> tuple[int, CheckpointState, dict] | None:
        """Restore the newest readable checkpoint under ``restore_path``, if any."""
        if not self.restore_path.exists():
            return None
        if self.restore_path.is_file():
            return self.restore_checkpoint(self.restore_path)
        for ckpt_path in sorted(
            self.restore_path.glob("ckpt_*.npz"), key=str, reverse=True
        ):
            try:
                return self.restore_checkpoint(ckpt_path)
            except Exception as e:  # noqa: BLE001 - fall back across corrupt files
                logger.warning("Error restoring checkpoint %s: %s", ckpt_path, e)
        return None

    @staticmethod
    def restore_checkpoint(
        ckpt: str | Path | AnyPath,
    ) -> tuple[int, CheckpointState, dict]:
        """Restore one checkpoint file.

        Args:
            ckpt: Checkpoint path.

        Returns:
            ``(next_step, state, adapt)``.  ``opt_state`` is ``None`` if it cannot be
            unpickled (e.g. a reference checkpoint whose kfac_jax classes are not
            importable here) — the caller reinitialises the optimizer.  ``adapt``
            holds the width-adaptation extras (``pmoves``, ``t``) when present;
            reference checkpoints yield an empty dict.
        """
        ckpt_path = AnyPath(ckpt)
        with ckpt_path.open("rb") as npf:
            blob = npf.read()
        import io

        adapt: dict = {}
        with np.load(io.BytesIO(blob), allow_pickle=True) as f:
            step = int(f["step"]) + 1
            params = f["params"].tolist()
            # Older flax pickles FrozenDicts; normalise to plain dicts so the tree
            # structure matches everything this framework builds (grads, shardings).
            from flax.core import unfreeze

            params = unfreeze(params)
            data = np.asarray(f["data"])
            try:
                opt_state = f["opt_state"].tolist()
            except Exception:  # noqa: BLE001
                logger.warning("Could not unpickle opt_state; reinitialising optimizer")
                opt_state = None
            mcmc_width = np.asarray(f["mcmc_width"]).reshape(()).item()
            for key in ("pmoves", "t"):
                if key in f.files:
                    adapt[key] = np.asarray(f[key])
        # Reference checkpoints store data flattened already; older multi-device
        # layouts with a leading device axis are folded back into the batch.
        if data.ndim == 4:
            data = data.reshape(-1, *data.shape[-2:])
        # Reference opt_states may carry a per-device leading axis via its redup
        # helper; our optimizers reinitialise in that case (handled by the driver).
        logger.info("Restored checkpoint %s", ckpt_path)
        state = CheckpointState(params, data, opt_state, np.float32(mcmc_width))
        return step, state, adapt

    @contextmanager
    def create_writer(self) -> Generator[StatsWriter | _NullWriter, None, None]:
        """Create a StatsWriter for ``train_stats.csv`` under the save dir.

        Non-main processes get a null sink instead.
        """
        if not self.write_artifacts:
            yield _NullWriter()
            return
        with StatsWriter(self.save_path / "train_stats.csv") as writer:
            yield writer


def get_git_commit() -> str:
    """Current short git revision, if available."""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).parent,
            text=True,
            stderr=subprocess.DEVNULL,
        ).strip()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return "''"


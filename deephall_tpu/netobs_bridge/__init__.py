"""NetObs-compatible bridge (optional dependency).

Mirrors the reference plugin surface (``/root/reference/deephall/netobs_bridge/``):
a ``NetworkAdaptor`` restoring runs from ``config.yml`` + checkpoint, a ``HallSystem``
system type, and estimator classes for density / pair correlation / 1-RDM / overlap,
registered under the ``netobs.cli.expansions`` entry point (see ``pyproject.toml``).

The external ``netobs`` package is not vendored; importing this package without it
raises a clear error.  The same observables are available without netobs through
``deephall_tpu.observables``.
"""

try:
    import netobs  # noqa: F401
except ImportError as e:  # pragma: no cover - depends on optional package
    raise ImportError(
        "deephall_tpu.netobs_bridge requires the external 'netobs' package. "
        "Install netobs, or use the built-in runner: "
        "python -m deephall_tpu.observables.runner CKPT --estimator <name>"
    ) from e

"""TPU compute primitives: determinant evaluation and (future) Pallas kernels."""

from deephall_tpu.ops.slogdet import signed_logsumdet

__all__ = ["signed_logsumdet"]

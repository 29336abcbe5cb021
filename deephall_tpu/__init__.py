"""deephall-tpu: TPU-native neural-network VMC for the fractional quantum Hall effect.

Public API parity with the reference (``/root/reference/deephall/__init__.py``):
``from deephall_tpu import Config, train``.
"""

from deephall_tpu.config import Config
from deephall_tpu.train import train

__all__ = ["Config", "train"]
__version__ = "0.1.0"

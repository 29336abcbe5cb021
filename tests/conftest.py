"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's distributed-testing strategy
(``/root/reference/tests/conftest.py:15-19``): every test exercises the real mesh /
sharding / collective paths across 8 virtual host devices, no TPU required.

Note: this image pre-registers a TPU PJRT plugin via sitecustomize before pytest
starts, so the env-var route (``JAX_PLATFORMS``) is already consumed; the config-API
route below still works because no backend has been initialised yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Correctness tests run on the JAX CPU backend so no TPU is needed
(SURVEY.md §4 lesson); sharding tests use the 8 virtual devices.  The
environment's axon TPU plugin registers itself through AXON_*/TPU_* env
vars and overrides JAX_PLATFORMS, so those are stripped before jax loads.
"""

import os
import sys

assert "jax" not in sys.modules, "conftest must run before jax is imported"

for _k in list(os.environ):
    if "AXON" in _k.upper() or _k.startswith("TPU_"):
        del os.environ[_k]

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

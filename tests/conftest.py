"""Test configuration: force an 8-device virtual CPU mesh.

Correctness tests run on the JAX CPU backend so no TPU is needed
(SURVEY.md §4 lesson); sharding tests use the 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

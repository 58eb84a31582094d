"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Correctness tests run on the JAX CPU backend so no TPU is needed
(SURVEY.md §4 lesson); sharding tests use the 8 virtual devices.  The
environment's axon TPU plugin registers itself through AXON_*/TPU_* env
vars and overrides JAX_PLATFORMS, so those are stripped before the first
backend initialization (a pytest plugin may have imported jax already;
that is fine as long as no backend exists yet).
"""

import os
import sys

for _k in list(os.environ):
    if "AXON" in _k.upper() or _k.startswith("TPU_"):
        del os.environ[_k]

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    import jax
    from jax._src import xla_bridge
    assert not xla_bridge.backends_are_initialized(), (
        "a JAX backend was initialized before conftest could force CPU")
    jax.config.update("jax_platforms", "cpu")

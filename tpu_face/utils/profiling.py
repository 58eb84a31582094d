"""Per-stage profiling hooks (off by default).

Two complementary layers (SURVEY.md §5 tracing plan):

* ``jax.named_scope`` labels are applied unconditionally inside the
  jitted programs (pipeline.py) — they cost nothing at runtime and make
  device traces (``jax.profiler.trace``) attribute every fused op to a
  cascade stage (detect / mesh / iris / warp).
* ``stage(name)`` wraps HOST-side regions in
  ``jax.profiler.TraceAnnotation`` when profiling is enabled via
  ``enable()`` or TPU_FACE_PROFILE=1 — useful to see dispatch vs
  device-compute in the same timeline.

The library stays silent and zero-overhead unless opted in.
"""

import contextlib
import os

_enabled = os.environ.get("TPU_FACE_PROFILE", "0") not in ("", "0")


def enable(on: bool = True) -> None:
    """Turn host-side TraceAnnotation stages on/off for this process."""
    global _enabled
    _enabled = bool(on)


def enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def stage(name: str):
    """Host-side profiler annotation (no-op unless enabled)."""
    if _enabled:
        import jax

        with jax.profiler.TraceAnnotation(f"tpu_face/{name}"):
            yield
    else:
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace (Perfetto/XPlane) of the enclosed region;
    always active — callers opt in by using it."""
    import jax

    with jax.profiler.trace(log_dir):
        yield

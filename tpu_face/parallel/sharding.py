"""Multi-chip scaling: batch data parallelism over a TPU ICI mesh.

The reference is single-host single-threaded (its only concurrency is a
rayon elementwise sigmoid, reference face_detection.rs:301-311); the
TPU-native parallelism story for an inference cascade is BATCH data
parallelism (SURVEY.md §2.4): replicate the (tiny, few-MB) CNN weights on
every chip, shard the frame batch across the ``data`` mesh axis, and let
XLA partition the whole fused cascade program.  No collectives are needed
in steady state — each chip owns its frames end-to-end; the only implicit
communication is the result gather when the host reads the output.

Works on any ``jax.sharding.Mesh`` (real TPU ICI, or the 8-device CPU
test mesh from ``--xla_force_host_platform_device_count``).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis_name: str = "data") -> Mesh:
    """A 1-d mesh over ``devices`` (default: all visible devices)."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(images, mesh: Mesh, axis_name: str = "data"):
    """Place a [B, H, W, C] batch batch-sharded over the mesh.

    B must divide by the mesh size.  The returned array is committed, so
    any jitted function consuming it is partitioned by XLA with the
    weights replicated — data parallelism without program changes.
    """
    b = images.shape[0]
    n = mesh.devices.size
    if b % n != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")
    sharding = NamedSharding(mesh, P(axis_name, None, None, None))
    return jax.device_put(images, sharding)


def infer_sharded(cascade, images, mesh: Optional[Mesh] = None,
                  axis_name: str = "data"):
    """Run a ``FaceCascade`` batch-sharded over ``mesh``.

    This is the cascade's multi-chip throughput path: per-chip batch
    ``B / n_devices``, one fused XLA program per chip, zero mid-cascade
    host syncs.
    """
    import jax.numpy as jnp
    if mesh is None:
        mesh = data_parallel_mesh(axis_name=axis_name)
    images = shard_batch(jnp.asarray(images), mesh, axis_name)
    return cascade(images)


def track_sharded(tracker, images, mesh: Optional[Mesh] = None,
                  axis_name: str = "data"):
    """Step a ``FaceTracker`` (or ``MultiFaceTracker`` — same step
    signature, per-slot state) with its B streams sharded over
    ``mesh``.

    Streams are data-parallel like cascade frames; the tracker's
    (roi, valid) state arrays come out of the jitted step sharded like
    the inputs, so state stays chip-resident across steps.  Steady
    state communicates only the tiny all-reduces behind the lost-count
    predicates; a step that repairs lost streams additionally pays a
    cross-chip gather/scatter of the ``repair_batch`` frames it
    re-detects (tracking.py's in-step repair sub-batch).
    """
    import jax.numpy as jnp
    if mesh is None:
        mesh = data_parallel_mesh(axis_name=axis_name)
    images = shard_batch(jnp.asarray(images), mesh, axis_name)
    return tracker.step(images)

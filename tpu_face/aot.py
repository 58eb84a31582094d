"""Ahead-of-time program export — serving cold-start without tracing.

The reference builds TFLite interpreters from flatbuffers at runtime
(face_detection.rs:146-203); the TPU-native equivalent of a deployable
inference artifact is the traced (and optionally compiled) XLA program
itself, weights baked in as constants.  Two artifact kinds:

- ``"stablehlo"`` (default, portable): ``jax.export`` serializes the
  traced StableHLO.  Loading skips Python tracing — the expensive
  host-side part of cascade cold-start (the fused programs take tens
  of seconds to trace; ``warp_profile="auto"`` traces both rt
  branches) — and compiles through the persistent compilation cache,
  so a warmed serving host pays neither trace nor compile.  Artifacts
  are platform-tagged (cpu vs tpu) and survive library-code changes:
  the program is frozen at save time.
- ``"executable"`` (opt-in): ``jax.experimental.serialize_executable``
  pickles the compiled PJRT executable — zero compile at load — but
  is only valid on the same device/runtime generation it was saved
  on, and not every PJRT backend supports it (``save`` raises a
  ``ValueError`` from the backend if unsupported).

``save()`` writes one artifact for one (pipeline class, batch,
height, width) program; ``load()`` returns a callable; ``attach()``
installs a loaded program back into a live pipeline/tracker's jit
cache so the ordinary host API (``__call__`` / ``infer_batch`` /
``step``) runs the pre-exported program.

``"stablehlo"`` artifacts are a pickle-free container (JSON metadata
header + raw ``jax.export`` payload bytes) and are safe to load from
untrusted sources — deserialization never executes artifact-supplied
code.  ``"executable"`` artifacts necessarily pickle the PJRT pytree
structures, so load only executables you produced (same trust model
as safetensors-with-pickle); ``load()`` refuses to unpickle unless
the file really is an executable-kind container.
"""

from __future__ import annotations

import json
import pickle
import struct
from pathlib import Path

import jax
import jax.numpy as jnp

_FORMAT = "tpu-face-aot-v1"
# pickle-free container for the "stablehlo" kind: magic, u64-be JSON
# metadata length, JSON metadata, raw jax.export payload to EOF
_MAGIC = b"TPUFACE-AOT\x00"

_registered = False


def _register_result_types():
    """Register the result/state namedtuples with jax.export (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export

    from .pipeline import CascadeResult, EmbedResult
    from .tracking import MultiTrackerState, TrackerState

    for cls in (CascadeResult, EmbedResult, TrackerState,
                MultiTrackerState):
        export.register_namedtuple_serialization(
            cls, serialized_name=f"tpu_face.{cls.__name__}")
    _registered = True


def _image_spec(layout: str, batch: int, h: int, w: int):
    shape = ((batch, 3, h, w) if layout == "planar"
             else (batch, h, w, 3))
    return jax.ShapeDtypeStruct(shape, jnp.uint8)


def _program_and_specs(obj, batch: int, h: int, w: int):
    """The jitted program for ``obj`` at (h, w) plus the argument
    ShapeDtypeStructs its trace needs at batch size ``batch``."""
    from .pipeline import _DetectorBase
    from .tracking import FaceTracker, MultiFaceTracker

    if isinstance(obj, _DetectorBase):
        return (obj._get_jitted(h, w),
                (_image_spec(obj._layout, batch, h, w),))
    if isinstance(obj, MultiFaceTracker):  # before FaceTracker: no subclassing, but explicit
        k = obj.max_faces
        return (obj._get_jitted((h, w)), (
            _image_spec(obj.cascade._layout, batch, h, w),
            jax.ShapeDtypeStruct((batch, k, 5), jnp.float32),
            jax.ShapeDtypeStruct((batch, k), jnp.bool_),
            jax.ShapeDtypeStruct((batch,), jnp.bool_),
            jax.ShapeDtypeStruct((), jnp.bool_),
        ))
    if isinstance(obj, FaceTracker):
        return (obj._get_jitted((h, w)), (
            _image_spec(obj.cascade._layout, batch, h, w),
            jax.ShapeDtypeStruct((batch, 5), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.bool_),
            jax.ShapeDtypeStruct((), jnp.bool_),
        ))
    raise TypeError(f"cannot export {type(obj).__name__}; expected a "
                    "FaceCascade/EmbedCascade/FaceDetection-style "
                    "pipeline, FaceTracker or MultiFaceTracker")


def _meta(obj, batch, h, w, kind):
    layout = (obj.cascade._layout if hasattr(obj, "cascade")
              else obj._layout)
    return {
        "format": _FORMAT,
        "kind": kind,
        "cls": type(obj).__name__,
        "batch": batch,
        "height": h,
        "width": w,
        "layout": layout,
        "platforms": None,  # filled for stablehlo
        "jax": jax.__version__,
    }


def save(obj, path, batch: int, height: int, width: int,
         kind: str = "stablehlo") -> Path:
    """Export ``obj``'s batched program at the given geometry.

    ``obj``: a ``FaceCascade`` / ``EmbedCascade`` (or any
    ``_DetectorBase``), a ``FaceTracker`` or a ``MultiFaceTracker``.
    The batch size and frame geometry are baked into the artifact
    (XLA programs are static-shape); save one artifact per serving
    configuration.
    """
    assert kind in ("stablehlo", "executable"), kind
    path = Path(path)
    fn, specs = _program_and_specs(obj, batch, height, width)
    meta = _meta(obj, batch, height, width, kind)
    if kind == "stablehlo":
        from jax import export

        _register_result_types()
        exp = export.export(fn)(*specs)
        meta["platforms"] = list(exp.platforms)
        head = json.dumps(meta).encode()
        with open(path, "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack(">Q", len(head)))
            f.write(head)
            f.write(bytes(exp.serialize()))
    else:
        from jax.experimental import serialize_executable as se

        compiled = fn.lower(*specs).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        meta["platforms"] = [jax.devices()[0].platform]
        container = {"meta": meta, "payload": payload,
                     "in_tree": pickle.dumps(in_tree),
                     "out_tree": pickle.dumps(out_tree)}
        with open(path, "wb") as f:
            pickle.dump(container, f)
    return path


class LoadedProgram:
    """A deserialized AOT artifact: ``meta`` dict + ``call``.

    ``call`` takes exactly the positional device arrays the saved
    program was exported with (images for cascades; (images, roi,
    valid, force) for trackers) at the saved batch/geometry.
    """

    def __init__(self, meta, call):
        self.meta = meta
        self.call = call

    def __call__(self, *args):
        return self.call(*args)


def load(path) -> LoadedProgram:
    with open(Path(path), "rb") as f:
        head = f.read(len(_MAGIC))
        if head == _MAGIC:
            # pickle-free stablehlo container — safe on untrusted input
            (n,) = struct.unpack(">Q", f.read(8))
            meta = json.loads(f.read(n).decode())
            if meta.get("format") != _FORMAT:
                raise ValueError(f"not a {_FORMAT} artifact: {path}")
            from jax import export

            _register_result_types()
            exp = export.deserialize(f.read())
            return LoadedProgram(meta, jax.jit(exp.call))
        # only the opt-in "executable" kind is pickled; refuse to
        # unpickle anything that doesn't at least look like one
        if not head.startswith(b"\x80"):
            raise ValueError(f"not a {_FORMAT} artifact: {path}")
        f.seek(0)
        container = pickle.load(f)
    meta = container["meta"]
    if meta.get("format") != _FORMAT or meta.get("kind") != "executable":
        raise ValueError(f"not a {_FORMAT} executable artifact: {path}")
    from jax.experimental import serialize_executable as se

    compiled = se.deserialize_and_load(
        container["payload"],
        pickle.loads(container["in_tree"]),
        pickle.loads(container["out_tree"]))
    return LoadedProgram(meta, compiled)


def attach(obj, path, pad_batch: bool = False) -> LoadedProgram:
    """Load an artifact and install it as ``obj``'s program for the
    saved geometry, so the normal host API uses it (no trace).

    Validates that the artifact was saved from the same pipeline
    class and input layout; the batch size must then match at call
    time (XLA static shapes — a mismatched batch raises with the
    artifact's expected shape in the error).

    ``pad_batch=True`` (cascades only — trackers carry per-stream
    state, where silent padding would corrupt lock bookkeeping) lets
    smaller batches ride the fixed-batch artifact: frames are
    zero-padded up to the saved batch and the result sliced back.
    Zero frames detect nothing, so they are ``face_valid=False``
    rows that the batch-level warp-dispatch predicates already
    ignore — the kept rows are bit-identical to a same-size live
    program (pinned in tests/test_aot.py).  The padded call costs
    the full saved-batch step; size artifacts for the common case
    and use ``pad_batch`` for stream tails.
    """
    if pad_batch and hasattr(obj, "cascade"):
        # FaceTracker/MultiFaceTracker
        raise ValueError("pad_batch only applies to stateless "
                         "cascades; tracker steps carry "
                         "per-stream state")
    prog = load(path)
    meta = prog.meta
    cls = type(obj).__name__
    if meta["cls"] != cls:
        raise ValueError(
            f"artifact was saved from {meta['cls']}, not {cls}")
    layout = (obj.cascade._layout if hasattr(obj, "cascade")
              else obj._layout)
    if meta["layout"] != layout:
        raise ValueError(f"artifact layout {meta['layout']!r} != "
                         f"pipeline layout {layout!r}")
    call = prog.call
    if pad_batch:
        saved_b = meta["batch"]

        def call(images, _inner=prog.call, _b=saved_b):
            got = images.shape[0]
            if got == _b:
                return _inner(images)
            if got > _b:
                raise ValueError(
                    f"batch {got} exceeds the artifact's saved "
                    f"batch {_b}")
            pad = [(0, _b - got)] + [(0, 0)] * (images.ndim - 1)
            out = _inner(jnp.pad(images, pad))
            return jax.tree_util.tree_map(lambda a: a[:got], out)

    # cascades key their jit cache by (h, w); trackers by hw=(h, w)
    obj._jitted[(meta["height"], meta["width"])] = call
    return prog

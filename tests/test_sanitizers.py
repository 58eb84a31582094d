"""Sanitizer + profiling-hook coverage (SURVEY.md §5).

The reference relies on Rust's type system; the JAX analog is
``jax_debug_nans`` (every primitive output checked for NaN) plus the
per-stage profiling hooks staying zero-cost when disabled.
"""

import numpy as np
import pytest


def test_cascade_under_debug_nans():
    """The full fused cascade runs NaN-free under jax_debug_nans (the
    clamped sigmoid, guarded NMS divisions and letterbox math must not
    produce intermediate NaNs)."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    jax.config.update("jax_debug_nans", True)
    try:
        cascade = FaceCascade(FaceDetectionModel.SHORT)
        res = cascade.infer_batch(img[None])
        assert bool(np.asarray(res.mesh_valid[0]))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_embed_cascade_under_debug_nans():
    """The fused identification pipeline is NaN-free under
    jax_debug_nans even for its garbage invalid-slot crops (the
    eps-guarded L2 norm)."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import EmbedCascade

    from pathlib import Path

    import tpu_face
    demo = Path(tpu_face.__file__).parent / "data" / "demo"
    jax.config.update("jax_debug_nans", True)
    try:
        cascade = EmbedCascade(FaceDetectionModel.SHORT, max_faces=2,
                               embed_model_path=str(demo))
        # a blank frame: every slot invalid, crops degenerate
        res = cascade.infer_batch(np.zeros((1, 240, 320, 3), np.uint8))
        assert not np.asarray(res.face_valid).any()
        assert np.isfinite(np.asarray(res.embedding)).all()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_tracker_repair_under_debug_nans():
    """One tracked + repaired step (dummy-ROI streams included) stays
    NaN-free under jax_debug_nans."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.tracking import FaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    frames = np.stack([img, img])
    jax.config.update("jax_debug_nans", True)
    try:
        tracker = FaceTracker(FaceDetectionModel.SHORT, repair_batch=1)
        tracker.step(frames)                       # full path
        res = tracker.step(np.stack([img, np.zeros_like(img)]))
        valid = np.asarray(res.mesh_valid)
        assert bool(valid[0]) and not bool(valid[1])
    finally:
        jax.config.update("jax_debug_nans", False)


def test_profiling_stage_disabled_is_noop():
    from tpu_face.utils import profiling

    assert not profiling.enabled()
    with profiling.stage("test"):  # must not require a profiler session
        x = 1 + 1
    assert x == 2


def test_profiling_stage_enabled_annotates():
    """Enabled stages wrap jax.profiler.TraceAnnotation without error
    even outside an active trace."""
    from tpu_face.utils import profiling

    profiling.enable(True)
    try:
        assert profiling.enabled()
        with profiling.stage("test"):
            pass
    finally:
        profiling.enable(False)


def test_named_scopes_in_cascade_hlo():
    """The stage labels survive into the lowered HLO, so device traces
    can attribute ops to cascade stages."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    cascade = FaceCascade(FaceDetectionModel.SHORT)
    fn = cascade._get_jitted(360, 540)
    text = fn.lower(jax.ShapeDtypeStruct((1, 360, 540, 3), np.uint8)
                    ).as_text(debug_info=True)
    for scope in ("tpu_face.detect", "tpu_face.nms", "tpu_face.mesh",
                  "tpu_face.iris"):
        assert scope in text, scope

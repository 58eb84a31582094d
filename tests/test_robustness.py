"""Edge-input robustness: the library must degrade gracefully, not
crash or emit garbage, on inputs the reference never exercises."""

import numpy as np
import pytest

from tpu_face.models import FaceDetection, FaceDetectionModel
from tpu_face.pipeline import FaceCascade


def test_black_image_no_detections():
    det = FaceDetection(FaceDetectionModel.SHORT)
    faces = det.infer(np.zeros((360, 540, 3), np.uint8))
    assert faces == []


def test_black_image_cascade_invalid():
    res = FaceCascade(FaceDetectionModel.SHORT).infer_batch(
        np.zeros((240, 320, 3), np.uint8))
    assert not bool(np.asarray(res.face_valid[0]))
    assert not bool(np.asarray(res.mesh_valid[0]))


def test_noise_image_no_false_faces():
    rng = np.random.RandomState(0)
    det = FaceDetection(FaceDetectionModel.SHORT)
    faces = det.infer(rng.randint(0, 256, (360, 540, 3), np.uint8))
    assert faces == []


def test_tiny_image_runs():
    """Images far below the model input size upscale through the warp
    without crashing (16x16 -> 128x128 letterbox)."""
    rng = np.random.RandomState(1)
    det = FaceDetection(FaceDetectionModel.SHORT)
    faces = det.infer(rng.randint(0, 256, (16, 16, 3), np.uint8))
    assert isinstance(faces, list)


def test_grayscale_input_rejected():
    det = FaceDetection(FaceDetectionModel.SHORT)
    with pytest.raises(ValueError, match="H,W,3"):
        det.infer(np.zeros((64, 64), np.uint8))


def test_nan_input_rejected():
    det = FaceDetection(FaceDetectionModel.SHORT)
    bad = np.full((64, 64, 3), np.nan, np.float32)
    with pytest.raises(ValueError, match="NaN"):
        det.infer(bad)


def test_nonsquare_extreme_aspect():
    """Extreme aspect ratios letterbox correctly (very wide strip)."""
    from tpu_face.ops.image import image_to_tensor

    img = np.full((40, 640, 3), 128, np.uint8)
    out = image_to_tensor(img, output_size=(128, 128),
                          keep_aspect_ratio=True)
    l, t, r, b = out.padding
    assert l == r == 0.0
    # 40/640 content in a square: pad fraction (1 - 40/640)/2
    assert abs(t - (1 - 40 / 640) / 2) < 1e-6 and abs(b - t) < 1e-6


def test_detection_model_path_override(tmp_path):
    with pytest.raises(FileNotFoundError, match="convert_tflite"):
        FaceDetection(FaceDetectionModel.SHORT, model_path=str(tmp_path))

"""End-to-end detection vs BASELINE.md ground truth on man.jpg.

Ground truth produced by running the reference's exact algorithms against
the bundled .tflite models (BASELINE.md).  Budget: bbox IoU >= 0.99,
keypoints <= 1 px.
"""

import numpy as np
import pytest

from tpu_face.models import FaceDetection, FaceDetectionModel

MAN = "/root/reference/test_data/man.jpg"
IMG_SIZE = (540, 360)


def _iou(a, b):
    xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
    xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
    if not (xmin < xmax and ymin < ymax):
        return 0.0
    inter = (xmax - xmin) * (ymax - ymin)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    return inter / (area(a) + area(b) - inter)


GROUND_TRUTH = {
    FaceDetectionModel.BACK_CAMERA: {
        "score": 0.9595,
        "bbox": (195.6, 74.1, 334.9, 213.4),
        "keypoints": [(237.2, 112.8), (292.2, 111.3), (265.0, 146.2),
                      (265.5, 173.5), (206.4, 127.2), (323.9, 124.9)],
    },
    FaceDetectionModel.SHORT: {
        "score": 0.9322,
        "bbox": (199.8, 74.6, 335.7, 210.6),
        "keypoints": None,
    },
    FaceDetectionModel.FULL_SPARSE: {
        "score": 0.9554,
        "bbox": (184.3, 60.7, 344.3, 220.7),
        "keypoints": None,
    },
}


@pytest.mark.parametrize("model_type", list(GROUND_TRUTH))
def test_detection_matches_reference(model_type):
    gt = GROUND_TRUTH[model_type]
    det = FaceDetection(model_type)
    faces = det.infer(MAN)
    assert len(faces) == 1
    face = faces[0]
    assert abs(face.score - gt["score"]) < 0.01
    b = face.bbox().scale(IMG_SIZE)
    iou = _iou(b.as_tuple(), gt["bbox"])
    assert iou >= 0.99, (b.as_tuple(), gt["bbox"], iou)
    if gt["keypoints"]:
        abs_face = face.scaled_by_image_size(IMG_SIZE)
        for k, (gx, gy) in enumerate(gt["keypoints"]):
            x, y = abs_face.keypoint(k)
            assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
                k, (x, y), (gx, gy))


def test_front_equals_short_weights():
    """front and short_range tflite files are byte-identical
    (SURVEY.md §2.1); detections must agree."""
    f1 = FaceDetection(FaceDetectionModel.FRONT_CAMERA).infer(MAN)
    f2 = FaceDetection(FaceDetectionModel.SHORT).infer(MAN)
    assert len(f1) == len(f2) == 1
    np.testing.assert_allclose(f1[0].data, f2[0].data, atol=1e-6)


def test_detection_normalized_coordinates():
    faces = FaceDetection(FaceDetectionModel.BACK_CAMERA).infer(MAN)
    b = faces[0].bbox()
    assert 0.0 < b.xmin < b.xmax < 1.0
    assert 0.0 < b.ymin < b.ymax < 1.0
    assert faces[0].keypoint_count == 6


def test_detection_with_roi():
    """Explicit ROI narrows the search region (reference infer's roi
    arg, face_detection.rs:205): a face-centered ROI still detects."""
    from tpu_face.types import Rect
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    roi = Rect(0.49, 0.40, 0.6, 0.8, 0.0, normalized=True)
    faces = det.infer(MAN, roi=roi)
    assert len(faces) >= 1


def test_detection_pallas_path_matches_gather():
    """The TPU warp path (interpreter on CPU) for standalone SHORT
    detection — regression for the x-window envelope bug (540-wide
    frame at 128-out needs cw=16)."""
    ref = FaceDetection(FaceDetectionModel.SHORT,
                        warp_method="gather").infer(MAN)
    out = FaceDetection(FaceDetectionModel.SHORT,
                        warp_method="pallas").infer(MAN)
    assert len(ref) == len(out) == 1
    np.testing.assert_allclose(out[0].data, ref[0].data, atol=2e-3)
    assert abs(out[0].score - ref[0].score) < 1e-2

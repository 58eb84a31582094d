"""End-to-end oracle tests on russ_cox_1.jpg (square) and
russ_cox_2.jpg (portrait) — BASELINE.md second/third-image rows.

man.jpg (tests/test_{detection,landmark}_e2e.py) is landscape, so its
detector letterbox pads top/bottom only; russ_cox_2.jpg (200x225)
pads LEFT/RIGHT, exercising the portrait arm of
``ops/image.letterbox_padding`` feeding coordinate un-mapping
end-to-end against the TFLite oracle, and russ_cox_1.jpg (400x400) is
the pad-free square case.  Ground truth from
``tools/gen_ground_truth.py <img> back short cascade`` (TFLite
interpreter + OpenCV preprocessing + sequential NMS — the reference's
exact algorithms, transform.rs:236-257 letterbox / lib.rs:18-84 flow).
Budgets: bbox IoU >= 0.99, landmarks <= 1 px.
"""

import numpy as np
import pytest

from tpu_face.models import FaceDetection, FaceDetectionModel
from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

RC1 = "/root/reference/test_data/russ_cox_1.jpg"
RC2 = "/root/reference/test_data/russ_cox_2.jpg"

GT = {
    RC1: {
        "size": (400, 400),
        "det": {
            FaceDetectionModel.BACK_CAMERA: {
                "score": 0.8924,
                "bbox": (118.9, 118.3, 287.7, 287.1),
                "keypoints": [(161.7, 166.7), (231.7, 161.1),
                              (195.7, 204.4), (200.2, 240.9),
                              (134.2, 186.7), (275.9, 175.9)],
            },
            FaceDetectionModel.SHORT: {
                "score": 0.8640,
                "bbox": (118.0, 118.9, 287.1, 288.0),
                "keypoints": None,
            },
        },
        "nose": (193.35, 203.44),
        "lmk33": (147.57, 162.89),
        "lmk263": (246.67, 160.37),
        "iris": {"L": (166.21, 162.74), "R": (232.70, 160.95)},
    },
    RC2: {
        "size": (200, 225),
        "det": {
            FaceDetectionModel.BACK_CAMERA: {
                "score": 0.9450,
                "bbox": (52.4, 67.2, 155.1, 169.9),
                "keypoints": [(78.2, 100.5), (120.3, 95.2),
                              (99.4, 125.2), (103.1, 145.2),
                              (62.5, 109.5), (147.3, 99.4)],
            },
            FaceDetectionModel.SHORT: {
                "score": 0.9508,
                "bbox": (50.0, 64.1, 157.2, 171.3),
                "keypoints": None,
            },
        },
        "nose": (98.25, 125.45),
        "lmk33": (70.08, 100.07),
        "lmk263": (128.33, 94.93),
        "iris": {"L": (80.68, 98.97), "R": (120.65, 95.23)},
    },
}


def _iou(a, b):
    xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
    xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
    if not (xmin < xmax and ymin < ymax):
        return 0.0
    inter = (xmax - xmin) * (ymax - ymin)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
    return inter / (area(a) + area(b) - inter)


def test_portrait_letterbox_pads_left_right():
    """russ_cox_2 really exercises the portrait arm: the detector
    letterbox pads left/right (the cond=False branch of
    image.letterbox_padding man.jpg never reaches), and its
    int-truncated pixel pads (12 != 12.5) force the exact
    double-resize path."""
    from tpu_face.ops.image import (letterbox_padding,
                                    letterbox_two_stage_params)

    pad_x, pad_y, ph, pv = letterbox_padding(200.0, 225.0, (256, 256),
                                             xp=np)
    assert pad_x > 0 and pad_y == 0, (pad_x, pad_y)
    np.testing.assert_allclose(pad_x, (1 - (1 / (225 / 200))) / 2,
                               atol=1e-6)
    assert (ph, pv) == (12, 0), (ph, pv)
    # 200+2*12 = 224 != 225: the fused single map is inexact here
    assert letterbox_two_stage_params((200, 225), (256, 256)) == \
        (225, 225, 12, 0, pad_x, 0.0)
    # ... while man.jpg's landscape geometry stays on the fused path
    assert letterbox_two_stage_params((540, 360), (256, 256)) is None
    assert letterbox_two_stage_params((400, 400), (128, 128)) is None


@pytest.mark.parametrize("image", [RC1, RC2])
@pytest.mark.parametrize("model_type", [FaceDetectionModel.BACK_CAMERA,
                                        FaceDetectionModel.SHORT])
def test_detection_matches_oracle(image, model_type):
    gt = GT[image]["det"][model_type]
    size = GT[image]["size"]
    faces = FaceDetection(model_type).infer(load_image(image))
    assert len(faces) == 1
    face = faces[0]
    assert abs(face.score - gt["score"]) < 0.01
    b = face.bbox().scale(size)
    iou = _iou(b.as_tuple(), gt["bbox"])
    assert iou >= 0.99, (image, b.as_tuple(), gt["bbox"], iou)
    if gt["keypoints"]:
        abs_face = face.scaled_by_image_size(size)
        for k, (gx, gy) in enumerate(gt["keypoints"]):
            x, y = abs_face.keypoint(k)
            assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
                image, k, (x, y), (gx, gy))


@pytest.mark.parametrize("image", [RC1, RC2])
def test_models_mesh_matches_oracle(image):
    """Standalone models chain (detect -> roi -> RAW mesh) vs the
    TFLite oracle: nose + the eye-outer landmarks (which the fused
    cascade replaces with iris-stage contour points)."""
    from tpu_face.models import FaceLandmark, face_detection_to_roi

    gt = GT[image]
    size = gt["size"]
    img = load_image(image)
    faces = FaceDetection(FaceDetectionModel.BACK_CAMERA).infer(img)
    roi = face_detection_to_roi(faces[0], size)
    mesh = FaceLandmark().infer(img, roi)
    assert len(mesh) == 468
    for idx, key in ((1, "nose"), (33, "lmk33"), (263, "lmk263")):
        gx, gy = gt[key]
        x, y = mesh[idx].x * size[0], mesh[idx].y * size[1]
        assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
            image, key, (x, y), (gx, gy))


@pytest.mark.parametrize("warp_method", ["gather", "pallas"])
@pytest.mark.parametrize("image", [RC1, RC2])
def test_cascade_matches_oracle(image, warp_method):
    """Fused cascade (detect -> mesh -> 2x iris) vs the TFLite oracle
    on the square and portrait frames, on both the exact-reference
    warp ("gather") and the TPU fast path ("pallas", interpret mode
    on CPU).  The cascade's mesh is iris-REFINED, so the raw eye-outer
    rows are asserted by test_models_mesh_matches_oracle instead; here
    the nose (refinement-invariant) + iris centers + bbox."""
    gt = GT[image]
    w, h = gt["size"]
    img = load_image(image)
    res = FaceCascade(warp_method=warp_method).infer_batch(img[None])
    assert bool(np.asarray(res.face_valid).reshape(-1)[0])
    assert bool(np.asarray(res.mesh_valid).reshape(-1)[0])

    det = np.asarray(res.detection).reshape(-1, 8, 2)[0]
    bbox_px = (det[0, 0] * w, det[0, 1] * h, det[1, 0] * w, det[1, 1] * h)
    iou = _iou(bbox_px, gt["det"][FaceDetectionModel.BACK_CAMERA]["bbox"])
    assert iou >= 0.99, (image, warp_method, bbox_px, iou)

    mesh = np.asarray(res.mesh).reshape(-1, 468, 3)[0]
    gx, gy = gt["nose"]
    x, y = mesh[1, 0] * w, mesh[1, 1] * h
    assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
        image, warp_method, "nose", (x, y), (gx, gy))

    iris = np.asarray(res.iris).reshape(-1, 2, 5, 3)[0]
    for e, key in ((0, "L"), (1, "R")):
        gx, gy = gt["iris"][key]
        x, y = iris[e, 0, 0] * w, iris[e, 0, 1] * h
        assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
            image, warp_method, key, (x, y), (gx, gy))

"""Batched standalone-model APIs match their single-image results."""

import numpy as np
import pytest

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceLandmark, IrisLandmark,
                             face_detection_to_roi,
                             iris_roi_from_face_landmarks)
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"
IMG_SIZE = (540, 360)


def test_detection_batch_matches_single():
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    img = load_image(MAN)
    single = det.infer(img)
    batch = det.infer_batch(np.stack([img, np.zeros_like(img), img]))
    assert len(batch) == 3
    assert len(batch[0]) == len(single) == 1
    assert batch[1] == []
    np.testing.assert_allclose(batch[0][0].data, single[0].data,
                               atol=1e-6)
    np.testing.assert_allclose(batch[2][0].data, single[0].data,
                               atol=1e-6)


def test_landmark_batch_matches_single():
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    img = load_image(MAN)
    roi = face_detection_to_roi(det.infer(img)[0], IMG_SIZE)
    lm = FaceLandmark()
    single = lm.infer(img, roi)
    lmk, presence = lm.infer_batch(np.stack([img, img]), [roi, roi])
    assert lmk.shape == (2, 468, 3)
    assert presence.shape == (2,) and presence[0] > 0.5
    np.testing.assert_allclose(
        lmk[0], np.array([[p.x, p.y, p.z] for p in single]), atol=1e-5)


def test_iris_batch_both_eyes_at_once():
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    img = load_image(MAN)
    roi = face_detection_to_roi(det.infer(img)[0], IMG_SIZE)
    mesh = FaceLandmark().infer(img, roi)
    l_roi, r_roi = iris_roi_from_face_landmarks(mesh, IMG_SIZE)
    ir = IrisLandmark()
    sl = ir.infer(img, l_roi, is_right_eye=False)
    sr = ir.infer(img, r_roi, is_right_eye=True)
    contour, iris = ir.infer_batch(np.stack([img, img]), [l_roi, r_roi],
                                   [False, True])
    assert contour.shape == (2, 71, 3) and iris.shape == (2, 5, 3)
    np.testing.assert_allclose(
        iris[0], np.array([[p.x, p.y, p.z] for p in sl.iris]), atol=1e-6)
    np.testing.assert_allclose(
        iris[1], np.array([[p.x, p.y, p.z] for p in sr.iris]), atol=1e-6)

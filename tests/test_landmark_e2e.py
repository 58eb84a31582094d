"""FaceMesh + iris end-to-end vs BASELINE.md ground truth on man.jpg.

Ground-truth values come from running the reference's exact algorithms
against the bundled .tflite models (BASELINE.md).  Budget: ROI params to
4e-3, landmarks <= 1 px.
"""

import numpy as np
import pytest

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceLandmark, IrisLandmark,
                             face_detection_to_roi,
                             iris_roi_from_face_landmarks,
                             update_face_landmarks_with_iris_results)

MAN = "/root/reference/test_data/man.jpg"
IMG_SIZE = (540, 360)


@pytest.fixture(scope="module")
def face_roi():
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    faces = det.infer(MAN)
    assert len(faces) == 1
    return face_detection_to_roi(faces[0], IMG_SIZE)


@pytest.fixture(scope="module")
def mesh(face_roi):
    lm = FaceLandmark()
    out = lm.infer(MAN, face_roi)
    assert len(out) == 468
    return out


def test_face_roi_matches_reference(face_roi):
    # BASELINE.md: center (0.4912, 0.3994), w 0.3870, h 0.5806,
    # rotation -0.0267 rad
    assert abs(face_roi.x_center - 0.4912) < 4e-3
    assert abs(face_roi.y_center - 0.3994) < 4e-3
    assert abs(face_roi.width - 0.3870) < 4e-3
    assert abs(face_roi.height - 0.5806) < 4e-3
    assert abs(face_roi.rotation - (-0.0267)) < 2e-3


def test_mesh_landmarks_match_reference(mesh):
    # BASELINE.md: lmk[1] nose (263.85, 143.37); lmk[33] (222.00, 109.96);
    # lmk[263] (302.91, 107.89) in pixels
    w, h = IMG_SIZE
    for idx, (gx, gy) in [(1, (263.85, 143.37)), (33, (222.00, 109.96)),
                          (263, (302.91, 107.89))]:
        x, y = mesh[idx].x * w, mesh[idx].y * h
        assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (
            idx, (x, y), (gx, gy))


def test_presence_flag_gates_empty(mesh):
    # A blank image has no face: presence score below threshold -> []
    lm = FaceLandmark()
    blank = np.zeros((360, 540, 3), np.uint8)
    assert lm.infer(blank) == []


def test_eye_rois_match_reference(mesh):
    left, right = iris_roi_from_face_landmarks(mesh, IMG_SIZE)
    # BASELINE.md: L center (0.4342, 0.3060) w 0.1060 rot 0.0259;
    #              R center (0.5381, 0.3021) w 0.1052 rot -0.1054
    assert abs(left.x_center - 0.4342) < 4e-3
    assert abs(left.y_center - 0.3060) < 4e-3
    assert abs(left.width - 0.1060) < 4e-3
    assert abs(left.rotation - 0.0259) < 8e-3
    assert abs(right.x_center - 0.5381) < 4e-3
    assert abs(right.y_center - 0.3021) < 4e-3
    assert abs(right.width - 0.1052) < 4e-3
    assert abs(right.rotation - (-0.1054)) < 8e-3


def test_iris_centers_match_reference(mesh):
    left_roi, right_roi = iris_roi_from_face_landmarks(mesh, IMG_SIZE)
    iris = IrisLandmark()
    li = iris.infer(MAN, left_roi, is_right_eye=False)
    ri = iris.infer(MAN, right_roi, is_right_eye=True)
    w, h = IMG_SIZE
    # BASELINE.md: iris centers L (236.17, 108.88); R (290.88, 108.35)
    lx, ly = li.iris[0].x * w, li.iris[0].y * h
    rx, ry = ri.iris[0].x * w, ri.iris[0].y * h
    assert abs(lx - 236.17) <= 1.0 and abs(ly - 108.88) <= 1.0, (lx, ly)
    assert abs(rx - 290.88) <= 1.0 and abs(ry - 108.35) <= 1.0, (rx, ry)
    assert len(li.contour) == 71 and len(li.iris) == 5
    assert len(li.eyeball_contour()) == 15


def test_mesh_refinement(mesh):
    left_roi, right_roi = iris_roi_from_face_landmarks(mesh, IMG_SIZE)
    iris = IrisLandmark()
    li = iris.infer(MAN, left_roi, is_right_eye=False)
    ri = iris.infer(MAN, right_roi, is_right_eye=True)
    refined = update_face_landmarks_with_iris_results(mesh, li, ri)
    assert len(refined) == 468
    # index 33 (left-eye corner) must now equal iris contour point 0
    assert refined[33] == li.contour[0]
    assert refined[263] == ri.contour[0]
    # a non-eye landmark is untouched
    assert refined[1] == mesh[1]

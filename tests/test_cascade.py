"""Fused cascade vs the per-stage models and BASELINE.md ground truth."""

import numpy as np
import pytest

from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"
IMG_SIZE = (540, 360)


@pytest.fixture(scope="module")
def result():
    cascade = FaceCascade()
    img = load_image(MAN)
    return cascade.infer_batch(img[None])


def test_cascade_detection_matches_reference(result):
    assert bool(result.face_valid[0])
    assert abs(float(result.score[0]) - 0.9595) < 0.01
    det = np.asarray(result.detection[0]) * np.array([IMG_SIZE])
    gt = (195.6, 74.1, 334.9, 213.4)
    got = (det[0, 0], det[0, 1], det[1, 0], det[1, 1])
    assert np.allclose(got, gt, atol=1.5), (got, gt)


def test_cascade_mesh_matches_reference(result):
    assert bool(result.mesh_valid[0])
    assert float(result.mesh_score[0]) > 0.99
    mesh = np.asarray(result.mesh_raw[0])
    w, h = IMG_SIZE
    for idx, (gx, gy) in [(1, (263.85, 143.37)), (33, (222.00, 109.96)),
                          (263, (302.91, 107.89))]:
        x, y = mesh[idx, 0] * w, mesh[idx, 1] * h
        assert abs(x - gx) <= 1.0 and abs(y - gy) <= 1.0, (idx, (x, y))


def test_cascade_iris_matches_reference(result):
    iris = np.asarray(result.iris[0])
    w, h = IMG_SIZE
    lx, ly = iris[0, 0, 0] * w, iris[0, 0, 1] * h
    rx, ry = iris[1, 0, 0] * w, iris[1, 0, 1] * h
    assert abs(lx - 236.17) <= 1.0 and abs(ly - 108.88) <= 1.0, (lx, ly)
    assert abs(rx - 290.88) <= 1.0 and abs(ry - 108.35) <= 1.0, (rx, ry)


def test_cascade_refinement(result):
    mesh = np.asarray(result.mesh[0])
    raw = np.asarray(result.mesh_raw[0])
    iris = np.asarray(result.iris[0])
    # eye-corner landmark 33 replaced by iris-stage contour point 0
    assert not np.allclose(mesh[33], raw[33], atol=1e-7)
    # non-eye landmark untouched
    np.testing.assert_array_equal(mesh[1], raw[1])
    assert iris.shape == (2, 5, 3)


def test_cascade_rois_match_reference(result):
    roi = np.asarray(result.face_roi[0])
    assert np.allclose(roi[:4], [0.4912, 0.3994, 0.3870, 0.5806],
                       atol=4e-3), roi
    eyes = np.asarray(result.eye_rois[0])
    assert np.allclose(eyes[0, :3], [0.4342, 0.3060, 0.1060],
                       atol=4e-3), eyes[0]
    assert np.allclose(eyes[1, :3], [0.5381, 0.3021, 0.1052],
                       atol=4e-3), eyes[1]


def test_cascade_batch_consistency(result):
    """A batch of identical images gives identical per-image results,
    and a no-face image comes back invalid."""
    cascade = FaceCascade()
    img = load_image(MAN)
    blank = np.zeros_like(img)
    batch = np.stack([img, blank, img])
    out = cascade.infer_batch(batch)
    np.testing.assert_allclose(np.asarray(out.mesh[0]),
                               np.asarray(out.mesh[2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.detection[0]),
                               np.asarray(result.detection[0]), atol=1e-5)
    assert not bool(out.face_valid[1])
    assert not bool(out.mesh_valid[1])


def test_cascade_multi_face():
    """max_faces=2 adds a face axis; slot 0 matches the single-face
    result on man.jpg (one face -> slot 1 invalid)."""
    from tpu_face.models.face_detection import FaceDetectionModel
    cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA, max_faces=2)
    img = load_image(MAN)
    out = cascade.infer_batch(img[None])
    assert out.mesh.shape == (1, 2, 468, 3)
    assert out.iris.shape == (1, 2, 2, 5, 3)
    assert bool(out.face_valid[0, 0])
    assert not bool(out.face_valid[0, 1])
    single = FaceCascade(FaceDetectionModel.BACK_CAMERA).infer_batch(
        img[None])
    # the max_faces=1 NMS fast path reassociates fp math vs the scan
    # path; ~1e-5 drift, far below the 1 px (~2e-3 normalized) budget
    np.testing.assert_allclose(np.asarray(out.mesh[0, 0]),
                               np.asarray(single.mesh[0]), atol=3e-4)


def test_cascade_multi_face_two_people():
    """russ_cox images each have one face; a two-face composite image
    yields two valid faces."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from PIL import Image
    a = Image.open("/root/reference/test_data/russ_cox_1.jpg")
    b = Image.open("/root/reference/test_data/russ_cox_2.jpg")
    size = (200, 225)
    composite = np.concatenate(
        [np.asarray(a.convert("RGB").resize(size)),
         np.asarray(b.convert("RGB").resize(size))], axis=1)
    cascade = FaceCascade(FaceDetectionModel.FULL, max_faces=4)
    out = cascade.infer_batch(composite[None])
    assert int(np.asarray(out.face_valid[0]).sum()) == 2
    # both meshes present
    assert bool(out.mesh_valid[0, 0]) and bool(out.mesh_valid[0, 1])


def test_cascade_eye_roi_rotation_matches_standalone(result):
    """Code-review regression: eye-ROI rotation must come from
    NORMALIZED landmarks (iris_landmark.rs:274) — on the non-square
    man.jpg an absolute-coordinate atan2 diverges."""
    eyes = np.asarray(result.eye_rois[0])
    # BASELINE.md: L rot 0.0259, R rot -0.1054
    assert abs(eyes[0, 4] - 0.0259) < 8e-3, eyes[0]
    assert abs(eyes[1, 4] - (-0.1054)) < 8e-3, eyes[1]


def test_cascade_bf16_within_budget():
    """bf16 compute path stays within the 1 px landmark budget on the
    CPU backend too."""
    import jax.numpy as jnp
    out = FaceCascade(compute_dtype=jnp.bfloat16).infer_batch(
        load_image(MAN)[None])
    assert bool(out.mesh_valid[0])
    mesh = np.asarray(out.mesh_raw[0])
    w, h = IMG_SIZE
    assert abs(mesh[1, 0] * w - 263.85) <= 1.0
    assert abs(mesh[1, 1] * h - 143.37) <= 1.0

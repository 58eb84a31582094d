"""Crowded-scene weighted-NMS fidelity.

The reference's weighted NMS iterates over ALL above-threshold detections
until the pool is empty (reference nms.rs:56-124); the repo's fixed-shape
program is an exact full-pool scan at any ``max_faces`` (per-iteration
argmax + on-the-fly IoU row — ``nms_top_m`` no longer truncates it).
These tests pin the semantics on a many-face scene driven through the
real detector net, and on a synthetic pool far larger than the old
default bound.
"""

import numpy as np
import pytest

from tpu_face.models import FaceDetection, FaceDetectionModel
from tpu_face.ops import image as image_ops
from tpu_face.ops import postprocess as post
from tpu_face.utils.image_io import load_image

from test_postprocess import oracle_weighted_nms

ROWS, COLS = 3, 4


@pytest.fixture(scope="module")
def face_grid():
    """12 copies of the man.jpg face tiled on one canvas."""
    img = load_image("/root/reference/test_data/man.jpg")
    crop = img[50:240, 170:360]
    ch, cw = crop.shape[:2]
    canvas = np.zeros((ROWS * ch, COLS * cw, 3), np.uint8)
    for r in range(ROWS):
        for c in range(COLS):
            canvas[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw] = crop
    return canvas


def _raw_detections(det, canvas):
    """Decoded boxes/scores/validity for the whole-image ROI (the NMS
    inputs, before any truncation)."""
    import jax.numpy as jnp

    h, w = canvas.shape[:2]
    roi = np.array([w / 2, h / 2, w, h, 0.0], np.float32)
    tensor, padding = image_ops.warp_image_to_tensor(
        jnp.asarray(canvas, jnp.float32), jnp.asarray(roi),
        (det.in_w, det.in_h), keep_aspect_ratio=True,
        output_range=(-1.0, 1.0), method=det._warp)
    rb, rs = det._net(tensor[None])
    boxes = post.decode_boxes(rb[0], det.anchors, float(det.in_h))
    scores = post.clamped_sigmoid(rs[0].reshape(-1))
    valid = post.detection_validity(boxes, scores)
    return boxes, scores, valid


def test_crowded_grid_matches_sequential_oracle(face_grid):
    """Repo weighted NMS == the sequential reference loop on a real
    12-face scene (merged rows, scores, and count)."""
    det = FaceDetection(FaceDetectionModel.FULL_SPARSE, max_faces=16,
                        nms_top_m=2304)
    boxes, scores, valid = _raw_detections(det, face_grid)
    got_d, got_s, got_v = post.weighted_nms(
        boxes, scores, valid, max_outputs=16, top_m=det.nms_top_m)
    got_d, got_s, got_v = map(np.asarray, (got_d, got_s, got_v))

    b, s = np.asarray(boxes, np.float64), np.asarray(scores, np.float64)
    want = oracle_weighted_nms(b, s, 0.3, 0.5)
    assert int(got_v.sum()) == len(want) == 12
    for k, (wd, ws) in enumerate(want):
        np.testing.assert_allclose(got_d[k], wd, atol=1e-5)
        np.testing.assert_allclose(got_s[k], ws, atol=1e-6)


def test_crowded_grid_detects_every_cell(face_grid):
    """End-to-end: one detection centered in each of the 12 grid cells."""
    det = FaceDetection(FaceDetectionModel.FULL_SPARSE, max_faces=16,
                        nms_top_m=2304)
    faces = det.infer(face_grid)
    assert len(faces) == 12
    h, w = face_grid.shape[:2]
    cells = set()
    for f in faces:
        b = f.bbox().scale((float(w), float(h)))
        cx = (b.xmin + b.xmax) / 2
        cy = (b.ymin + b.ymax) / 2
        cells.add((int(cy // (h / ROWS)), int(cx // (w / COLS))))
    assert len(cells) == 12  # every cell got exactly one face


def test_weighted_nms_pool_beyond_default_bound():
    """A 300-candidate pool (> the default top_m=128) is exact when
    top_m covers it — the crowded-scene escape hatch."""
    rng = np.random.default_rng(11)
    n = 300
    centers = rng.uniform(0.1, 0.9, (n, 2))
    sizes = rng.uniform(0.04, 0.12, (n, 2))
    data = np.zeros((n, 3, 2), np.float32)
    data[:, 0] = centers - sizes / 2
    data[:, 1] = centers + sizes / 2
    data[:, 2] = centers
    scores = rng.uniform(0.55, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)

    want = oracle_weighted_nms(data.astype(np.float64), scores, 0.3, 0.5)
    got_d, got_s, got_v = post.weighted_nms(
        data, scores, valid, max_outputs=n, top_m=n)
    got_d, got_s, got_v = map(np.asarray, (got_d, got_s, got_v))
    assert int(got_v.sum()) == len(want)
    for k, (wd, ws) in enumerate(want):
        np.testing.assert_allclose(got_d[k], wd, atol=2e-5)
        np.testing.assert_allclose(got_s[k], ws, atol=1e-6)


def test_cascade_max_faces_8_on_grid(face_grid):
    """FaceCascade(max_faces=8) runs the full mesh+iris chain on the
    crowded scene: 8 valid faces in 8 distinct cells, each mesh's nose
    landmark inside its face's cell."""
    from tpu_face.pipeline import FaceCascade

    cascade = FaceCascade(FaceDetectionModel.FULL_SPARSE, max_faces=8,
                          nms_top_m=2304)
    res = cascade.infer_batch(face_grid[None])
    valid = np.asarray(res.mesh_valid[0])
    assert valid.sum() == 8
    h, w = face_grid.shape[:2]
    mesh = np.asarray(res.mesh[0])  # [8, 468, 3] normalized
    det = np.asarray(res.detection[0])
    cells = set()
    for i in range(8):
        if not valid[i]:
            continue
        nose = mesh[i, 1]
        cell = (int(nose[1] * h // (h / ROWS)),
                int(nose[0] * w // (w / COLS)))
        cells.add(cell)
        # the nose lands inside the detected bbox
        assert det[i, 0, 0] <= nose[0] <= det[i, 1, 0]
        assert det[i, 0, 1] <= nose[1] <= det[i, 1, 1]
    assert len(cells) == 8

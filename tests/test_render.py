"""Render layer: annotation data model + rasterizer.

Structural pixel assertions plus a coarse comparison against the
reference's golden images (assets/man_*.png were produced by the
reference's Rust renderer; line rasterization differs by ±1 px so the
comparison is coverage-based, not bit-exact).
"""

import numpy as np
import pytest

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceLandmark, IrisLandmark,
                             face_detection_to_roi,
                             face_landmarks_to_render_data,
                             eye_landmarks_to_render_data,
                             iris_landmarks_to_render_data,
                             iris_roi_from_face_landmarks)
from tpu_face.render import (Annotation, Color, Colors, Line, Point,
                             RectOrOval, detections_to_render_data,
                             landmarks_to_render_data, render_to_image)
from tpu_face.types import Detection, Landmark

MAN = "/root/reference/test_data/man.jpg"
IMG_SIZE = (540, 360)


def test_color_palette():
    assert Colors.GREEN.rgba == (0, 255, 0, 255)
    assert Color(1, 2, 3, 4).as_tuple() == (1, 2, 3, 4)


def test_annotation_scaling():
    ann = Annotation([Point(0.5, 0.5), Line(0.0, 0.0, 1.0, 1.0)],
                     normalized_positions=True, thickness=2.0,
                     color=Colors.RED)
    s = ann.scaled((100.0, 200.0))
    assert not s.normalized_positions
    assert s.data[0] == Point(50.0, 100.0)
    assert s.data[1] == Line(0.0, 0.0, 100.0, 200.0)
    with pytest.raises(ValueError):
        s.scaled((2.0, 2.0))


def test_detections_to_render_data_rows():
    det = Detection(np.array([[0.1, 0.2], [0.3, 0.4], [0.15, 0.25]]), 0.9)
    anns = detections_to_render_data([det], bounds_color=Colors.GREEN,
                                     keypoint_color=Colors.RED)
    assert len(anns) == 2
    rect = anns[0].data[0]
    assert isinstance(rect, RectOrOval)
    assert rect.as_tuple() == pytest.approx((0.1, 0.2, 0.3, 0.4))
    # keypoint annotation includes ALL rows (reference render.rs:288-298)
    assert len(anns[1].data) == 3


def test_rasterizer_hollow_rect_pixels():
    img = np.zeros((100, 100, 3), np.uint8)
    anns = [Annotation([RectOrOval(10, 20, 30, 40, False)], False, 1.0,
                       Colors.GREEN)]
    out = np.array(render_to_image(anns, img))
    green = (out[..., 1] == 255) & (out[..., 0] == 0)
    # 1-px border spanning x 10..29, y 20..39 (imageproc of_size semantics)
    assert green[20, 10] and green[20, 29] and green[39, 10]
    assert green[39, 29]
    assert not green[20, 30] and not green[40, 10]
    assert not green[21, 11]  # interior hollow


def test_rasterizer_point_square():
    img = np.zeros((50, 50, 3), np.uint8)
    anns = [Annotation([Point(25, 25)], False, 4.0, Colors.RED)]
    out = np.array(render_to_image(anns, img))
    red = (out[..., 0] == 255)
    # half = 2 -> spans 23..26
    assert red[23:27, 23:27].all()
    assert not red[22, 25] and not red[27, 25]


def test_rasterizer_point_near_edge_no_wrap():
    """Reference u32-underflow quirk (SURVEY.md 2.2.5) is fixed: points
    near the edge clip instead of wrapping."""
    img = np.zeros((50, 50, 3), np.uint8)
    anns = [Annotation([Point(0, 0)], False, 4.0, Colors.RED)]
    out = np.array(render_to_image(anns, img))
    red = (out[..., 0] == 255)
    assert red[0:2, 0:2].all()
    assert red.sum() == 4  # clipped, nothing wrapped to the far edge


def test_landmarks_to_render_data_output_append():
    lmks = [Landmark(0.1, 0.1), Landmark(0.9, 0.9)]
    base = []
    out = landmarks_to_render_data(lmks, [(0, 1)], output=base)
    assert out is base and len(base) == 2
    assert isinstance(base[0].data[0], Line)
    assert len(base[1].data) == 2


@pytest.fixture(scope="module")
def cascade():
    det = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    faces = det.infer(MAN)
    roi = face_detection_to_roi(faces[0], IMG_SIZE)
    mesh = FaceLandmark().infer(MAN, roi)
    l_roi, r_roi = iris_roi_from_face_landmarks(mesh, IMG_SIZE)
    iris = IrisLandmark()
    li = iris.infer(MAN, l_roi, is_right_eye=False)
    ri = iris.infer(MAN, r_roi, is_right_eye=True)
    return faces, mesh, li, ri


def _annotated_mask(photo: np.ndarray, rendered: np.ndarray) -> np.ndarray:
    """Pixels that the renderer changed.  The reference golden PNGs embed
    a slightly different JPEG decode of the photo (libjpeg vs Pillow), so
    "annotated" means differing from the photo by more than 30 levels."""
    diff = np.abs(rendered[..., :3].astype(np.int16)
                  - photo.astype(np.int16)).max(axis=-1)
    return diff > 30


def _coverage(ours: np.ndarray, golden: np.ndarray) -> float:
    """Fraction of the golden's annotated pixels we also annotate within
    a 2-px dilation (absorbs Bresenham vs linspace line rounding)."""
    from scipy import ndimage
    mask_o = ndimage.binary_dilation(ours, iterations=2)
    return (golden & mask_o).sum() / max(golden.sum(), 1)


@pytest.mark.parametrize("golden_name", ["man_bbox", "man_landmark",
                                         "man_iris"])
def test_golden_images(cascade, golden_name, tmp_path):
    """Render the same annotations as the reference's integration test
    (reference lib.rs:18-84) and compare annotated-pixel coverage with
    its committed goldens."""
    from PIL import Image
    faces, mesh, li, ri = cascade
    img = np.asarray(Image.open(MAN).convert("RGB"))

    # Same calls as the reference's golden generator (lib.rs:42-83).
    if golden_name == "man_bbox":
        anns = detections_to_render_data(
            faces, bounds_color=Colors.GREEN, keypoint_color=None,
            line_width=4, point_width=2)
    elif golden_name == "man_landmark":
        anns = face_landmarks_to_render_data(mesh, Colors.RED, Colors.RED,
                                             thickness=2.0)
    else:
        anns = eye_landmarks_to_render_data(ri.eyeball_contour(),
                                            Colors.RED, Colors.RED,
                                            thickness=2.0)
        anns = eye_landmarks_to_render_data(li.eyeball_contour(),
                                            Colors.RED, Colors.RED,
                                            thickness=2.0, output=anns)

    out = np.array(render_to_image(anns, img))
    golden = np.array(Image.open(
        f"/root/reference/assets/{golden_name}.png").convert("RGB"))
    cov = _coverage(_annotated_mask(img, out),
                    _annotated_mask(img, golden))
    Image.fromarray(out).save(tmp_path / f"{golden_name}.png")
    assert cov >= 0.90, (golden_name, cov)

"""Unit tests: core types (reference types.rs) and ROI geometry
(reference transform.rs:16-165)."""

import math

import numpy as np
import pytest

from tpu_face.ops import geometry
from tpu_face.ops.image import letterbox_padding
from tpu_face.types import BBox, Detection, Landmark, Rect


# ---- Rect --------------------------------------------------------------

def test_rect_scaled_roundtrip():
    r = Rect(0.5, 0.4, 0.25, 0.3, rotation=0.1, normalized=True)
    a = r.scaled((200.0, 100.0), normalize=False)
    assert (a.x_center, a.y_center, a.width, a.height) == (100, 40, 50, 30)
    assert not a.normalized
    back = a.scaled((200.0, 100.0), normalize=True)
    assert back.x_center == pytest.approx(0.5)
    assert back.normalized


def test_rect_size_truncates_absolute():
    # reference types.rs:52-59: absolute rect size truncates to int
    assert Rect(0, 0, 10.9, 20.7, normalized=False).size() == (10.0, 20.0)
    assert Rect(0, 0, 0.109, 0.207, normalized=True).size() == \
        (0.109, 0.207)


def test_rect_points_rotation():
    r = Rect(0.0, 0.0, 2.0, 2.0, rotation=math.pi / 2, normalized=False)
    pts = r.points()
    # 90 deg clockwise: top-left (-1,-1) -> (1,-1)
    assert pts[0][0] == pytest.approx(1.0)
    assert pts[0][1] == pytest.approx(-1.0)


# ---- BBox --------------------------------------------------------------

def test_bbox_properties():
    b = BBox(0.1, 0.2, 0.5, 0.6)
    assert b.width == pytest.approx(0.4)
    assert b.height == pytest.approx(0.4)
    assert not b.empty
    assert b.area == pytest.approx(0.16)
    assert b.normalized
    assert BBox(10, 10, 5, 20).empty
    assert BBox(10, 10, 5, 20).area == 0.0


def test_bbox_intersect():
    a = BBox(0.0, 0.0, 1.0, 1.0)
    b = BBox(0.5, 0.5, 1.5, 1.5)
    i = a.intersect(b)
    assert i.as_tuple() == (0.5, 0.5, 1.0, 1.0)
    assert a.intersect(BBox(2.0, 2.0, 3.0, 3.0)) is None


def test_bbox_scale_absolute():
    b = BBox(0.1, 0.2, 0.5, 0.6)
    assert b.scale((10, 10)).as_tuple() == pytest.approx((1, 2, 5, 6))
    assert b.absolute((100, 200)).as_tuple() == \
        pytest.approx((10, 40, 50, 120))
    big = BBox(10, 20, 50, 60)
    assert big.absolute((100, 200)) is big  # already absolute


# ---- Detection ---------------------------------------------------------

def test_detection_accessors():
    data = np.array([[0.1, 0.2], [0.3, 0.4], [0.15, 0.25], [0.2, 0.3]])
    d = Detection(data, 0.9)
    assert d.keypoint_count == 2
    assert d.keypoint(0) == pytest.approx((0.15, 0.25))
    assert d.bbox().as_tuple() == pytest.approx((0.1, 0.2, 0.3, 0.4))
    s = d.scaled_by_image_size((100, 200))
    assert s.bbox().as_tuple() == pytest.approx((10, 40, 30, 80))
    assert d.scaled(2.0).keypoint(1) == pytest.approx((0.4, 0.6))
    flat = Detection(np.array([0.1, 0.2, 0.3, 0.4]), 0.5)
    assert flat.data.shape == (2, 2)


# ---- geometry ----------------------------------------------------------

def test_normalize_rotation_range():
    for a in (-10.0, -math.pi, 0.0, 3.0, 10.0):
        n = float(geometry.normalize_rotation(a))
        assert -math.pi <= n < math.pi
        assert math.isclose(math.sin(n), math.sin(a), abs_tol=1e-9)


def test_rotation_from_keypoints_level_eyes():
    # level eye pair -> zero rotation (reference transform.rs:62-75)
    rot = geometry.rotation_from_keypoints(0.4, 0.5, 0.6, 0.5)
    assert float(rot) == pytest.approx(0.0)
    # right eye lower -> positive(clockwise) angle sign convention
    rot = geometry.rotation_from_keypoints(0.4, 0.4, 0.6, 0.6)
    assert float(rot) == pytest.approx(math.pi / 4)


@pytest.mark.parametrize("mode,expected", [
    # bbox 0.4x0.2 on a 100x100 image -> abs 40x20
    (geometry.SIZE_MODE_SQUARE_LONG, (0.4, 0.4)),
    (geometry.SIZE_MODE_SQUARE_SHORT, (0.2, 0.2)),
    (geometry.SIZE_MODE_DEFAULT, (0.4, 0.2)),
])
def test_select_roi_size_modes(mode, expected):
    got = geometry.select_roi_size(0.0, 0.0, 0.4, 0.2, (100, 100), mode)
    assert tuple(float(g) for g in got) == pytest.approx(expected)


def test_bbox_to_roi_scale_and_rotation():
    cx, cy, w, h, rot = geometry.bbox_to_roi(
        0.2, 0.2, 0.6, 0.6, (100, 100),
        rotation_keypoints=((0.3, 0.4), (0.5, 0.4)),
        scale=(1.5, 1.5), size_mode=geometry.SIZE_MODE_SQUARE_LONG)
    assert (float(cx), float(cy)) == pytest.approx((0.4, 0.4))
    assert float(w) == pytest.approx(0.6)  # 0.4 long side * 1.5
    assert float(rot) == pytest.approx(0.0)


def test_letterbox_padding_man_geometry():
    # 540x360 -> square: pad_y = 1/6 (BASELINE.md)
    pad_x, pad_y, ph, pv = (float(v) for v in
                            letterbox_padding(540.0, 360.0, (256, 256)))
    assert pad_x == 0.0
    assert pad_y == pytest.approx(1.0 / 6.0)
    assert ph == 0.0
    assert pv == 90.0  # trunc(1/6 * 540)


def test_landmark_equality():
    assert Landmark(0.1, 0.2, 0.3) == Landmark(0.1, 0.2, 0.3)
    assert Landmark(0.1, 0.2) != Landmark(0.1, 0.3)

"""Coverage for public API corners no other test exercises:
iris depth metric, filled render elements, device-trace hook.
"""

import glob
import os

import numpy as np

from tpu_face.models.iris_landmark import IrisIndex, get_iris_depth
from tpu_face.types import Landmark


def test_get_iris_depth_formula():
    """depth = 11.8 mm * hypot(focal, off-center-px) / iris_px
    (reference iris_landmark.rs:421-433, integer-divided midpoint)."""
    size = (540, 360)
    lmks = [Landmark(0.0, 0.0, 0.0)] * 5
    # center landmark 30 px right of / 40 px below the int midpoint
    cx = (540 // 2 + 30) / 540
    cy = (360 // 2 + 40) / 360
    lmks[IrisIndex.CENTER] = Landmark(cx, cy, 0.0)
    d = get_iris_depth(lmks, focal_length_mm=120.0, iris_size_px=11.0,
                       image_size=size)
    expect = 11.8 * np.hypot(120.0, np.hypot(30.0, 40.0)) / 11.0
    np.testing.assert_allclose(d, expect, rtol=1e-6)
    # doubling the apparent iris halves the depth
    d2 = get_iris_depth(lmks, 120.0, 22.0, size)
    np.testing.assert_allclose(d2, d / 2.0, rtol=1e-6)


def test_filled_rect_and_oval_render():
    from tpu_face.render import (Annotation, Color, FilledRectOrOval,
                                 RectOrOval, render_to_image)

    img = np.zeros((40, 60, 3), np.uint8)
    fill = Color(0, 200, 0)
    items = [
        FilledRectOrOval(RectOrOval(5, 5, 20, 15, oval=False), fill),
        FilledRectOrOval(RectOrOval(30, 20, 55, 35, oval=True), fill),
    ]
    ann = Annotation(items, normalized_positions=False, thickness=1.0,
                     color=fill)
    out = np.asarray(render_to_image([ann], img))
    # interior of the filled rect is painted
    assert (out[10, 12, :3] == [0, 200, 0]).all()
    # oval-as-rect quirk (reference render.rs draws ovals as rects):
    # the filled "oval" paints its bounding-box interior too
    assert (out[27, 42, :3] == [0, 200, 0]).all()
    # outside stays black
    assert (out[2, 2, :3] == [0, 0, 0]).all()


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from tpu_face.utils import profiling

    with profiling.device_trace(str(tmp_path)):
        jnp.asarray(np.arange(8.0)).sum().block_until_ready()
    found = glob.glob(os.path.join(str(tmp_path), "**", "*"),
                      recursive=True)
    assert any(os.path.isfile(f) for f in found), found

"""Cascade end-to-end on non-540x360 geometries.

The review found the original suite only exercised man.jpg's landscape
540x360. Here man.jpg is pasted at a known offset into canvases of
different shapes; every stage's coordinate math (letterbox, bands,
ROI rotation spaces) must reproduce the known ground truth after the
affine placement.
"""

import numpy as np
import pytest

from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"
# BASELINE.md ground truth in man.jpg pixels
GT_NOSE = (263.85, 143.37)
GT_IRIS_L = (236.17, 108.88)


def _canvas_with_face(canvas_h, canvas_w, off_y, off_x):
    img = load_image(MAN)
    canvas = np.full((canvas_h, canvas_w, 3), 255, np.uint8)
    canvas[off_y:off_y + img.shape[0], off_x:off_x + img.shape[1]] = img
    return canvas


GEOMETRIES = [
    # (canvas h, w, off_y, off_x) — portrait, square, wide landscape
    (600, 560, 120, 10),
    (544, 544, 90, 0),
    (368, 960, 0, 200),
]


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_cascade_on_other_geometries(geom):
    ch, cw, oy, ox = geom
    canvas = _canvas_with_face(ch, cw, oy, ox)
    out = FaceCascade().infer_batch(canvas[None])
    assert bool(out.face_valid[0]), geom
    assert bool(out.mesh_valid[0]), geom
    nose = np.asarray(out.mesh_raw[0][1])
    nx, ny = nose[0] * cw, nose[1] * ch
    assert abs(nx - (GT_NOSE[0] + ox)) <= 2.0, (geom, nx)
    assert abs(ny - (GT_NOSE[1] + oy)) <= 2.0, (geom, ny)
    iris = np.asarray(out.iris[0])
    lx, ly = iris[0, 0, 0] * cw, iris[0, 0, 1] * ch
    assert abs(lx - (GT_IRIS_L[0] + ox)) <= 2.0, (geom, lx)
    assert abs(ly - (GT_IRIS_L[1] + oy)) <= 2.0, (geom, ly)


def test_cascade_pallas_path_other_geometry():
    """The TPU warp path (interpreter on CPU) on a portrait canvas —
    exercises the band/clip/mask logic outside 540x360."""
    ch, cw, oy, ox = 600, 560, 120, 10
    canvas = _canvas_with_face(ch, cw, oy, ox)
    out = FaceCascade(warp_method="pallas").infer_batch(canvas[None])
    assert bool(out.mesh_valid[0])
    nose = np.asarray(out.mesh_raw[0][1])
    assert abs(nose[0] * cw - (GT_NOSE[0] + ox)) <= 2.0
    assert abs(nose[1] * ch - (GT_NOSE[1] + oy)) <= 2.0

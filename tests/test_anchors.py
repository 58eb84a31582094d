"""SSD anchor generation (reference face_detection.rs:366-413).

Counts verified in SURVEY.md §2.1: front/short/back -> 896,
full/full_sparse -> 2304.
"""

import numpy as np

from tpu_face.ops.anchors import SSDOptions, ssd_generate_anchors


def test_anchor_counts():
    assert ssd_generate_anchors(SSDOptions.front()).shape == (896, 2)
    assert ssd_generate_anchors(SSDOptions.short()).shape == (896, 2)
    assert ssd_generate_anchors(SSDOptions.back()).shape == (896, 2)
    assert ssd_generate_anchors(SSDOptions.full()).shape == (2304, 2)


def test_front_anchor_layout():
    a = ssd_generate_anchors(SSDOptions.front())
    # stride-8 layer: 16x16 grid, 2 repeats; first anchors at (0.5/16,...)
    np.testing.assert_allclose(a[0], [0.5 / 16, 0.5 / 16])
    np.testing.assert_allclose(a[1], [0.5 / 16, 0.5 / 16])
    np.testing.assert_allclose(a[2], [1.5 / 16, 0.5 / 16])
    # merged stride-16 layers: 8x8 grid, 6 repeats each
    np.testing.assert_allclose(a[512], [0.5 / 8, 0.5 / 8])
    np.testing.assert_allclose(a[517], [0.5 / 8, 0.5 / 8])
    np.testing.assert_allclose(a[518], [1.5 / 8, 0.5 / 8])
    assert 512 + 8 * 8 * 6 == 896


def test_full_anchor_layout():
    a = ssd_generate_anchors(SSDOptions.full())
    # single stride-4 layer, 48x48 grid, 1 repeat
    np.testing.assert_allclose(a[0], [0.5 / 48, 0.5 / 48])
    np.testing.assert_allclose(a[1], [1.5 / 48, 0.5 / 48])
    np.testing.assert_allclose(a[-1], [47.5 / 48, 47.5 / 48])

"""Property tests: the host-side envelope dispatch and the traced
envelope check cannot drift, because both derive from the ONE
letterbox/derivative algebra (``image.warp_derivatives`` /
``image.letterbox_padding``).

A round-2 review flagged that ``pallas_warp.extents_host`` hand-
duplicated ``_source_coords``' letterbox math; silent drift would
mis-dispatch warps.  These tests pin (a) the numpy and jnp letterbox
paths bit-agree, (b) host extents match extents measured from the
actual traced sampling grids, (c) ``envelope_ok_host`` equals the
traced ``envelope_ok`` away from knife-edge ROIs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_face.ops import image as image_ops
from tpu_face.ops import pallas_warp

W, H = 540, 360


def _fuzz_rois(rng, n):
    """ROI corpus spanning the cascade's envelope and well beyond it
    (sizes up to 1.6x the frame, rotations to +-0.6 rad)."""
    cx = rng.uniform(0.0, W, n)
    cy = rng.uniform(0.0, H, n)
    size = rng.uniform(8.0, 1.6 * max(W, H), n)
    ar = rng.uniform(0.5, 2.0, n)
    rot = rng.uniform(-0.6, 0.6, n)
    return np.stack([cx, cy, size, size * ar, rot],
                    axis=1).astype(np.float32)


def test_letterbox_padding_np_equals_jnp():
    rng = np.random.default_rng(7)
    for roi in _fuzz_rois(rng, 100):
        rw, rh = float(roi[2]), float(roi[3])
        for out_size in ((64, 64), (192, 192), (256, 256)):
            a = image_ops.letterbox_padding(rw, rh, out_size, xp=np)
            b = image_ops.letterbox_padding(
                jnp.float32(rw), jnp.float32(rh), out_size)
            got = np.array([float(v) for v in b])
            want = np.array([float(v) for v in a])
            np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7,
                                       err_msg=str(roi))


@pytest.mark.parametrize("keep_aspect,out_size",
                         [(False, (192, 192)), (True, (64, 64)),
                          (True, (256, 256))])
def test_host_extents_match_traced_grid(keep_aspect, out_size):
    """extents_host == extents measured from the real sampling grid."""
    rng = np.random.default_rng(11)
    cw, rt = 32, 8
    for roi in _fuzz_rois(rng, 60):
        sx, sy, _ = image_ops._source_coords(
            jnp.asarray(roi), out_size, keep_aspect, False)
        sx, sy = np.asarray(sx, np.float64), np.asarray(sy, np.float64)
        dxdu = abs(sx[0, 1] - sx[0, 0])
        dxdv = abs(sx[1, 0] - sx[0, 0])
        dydu = abs(sy[0, 1] - sy[0, 0])
        dydv = abs(sy[1, 0] - sy[0, 0])
        want_x = cw * dxdu + rt * dxdv + 2.0
        want_y = rt * dydv + cw * dydu + 2.0
        got_x, got_y = pallas_warp.extents_host(roi, out_size,
                                                keep_aspect, cw, rt)
        # f32 grid-difference noise only: ~2^-23 * |coord| per tap
        np.testing.assert_allclose(got_x, want_x, rtol=1e-2, atol=5e-3,
                                   err_msg=str(roi))
        np.testing.assert_allclose(got_y, want_y, rtol=1e-2, atol=5e-3,
                                   err_msg=str(roi))


@pytest.mark.parametrize("keep_aspect,out_size,band",
                         [(False, (192, 192), 64), (True, (64, 64), 32),
                          (True, (64, 64), 48), (False, (192, 192), 128)])
def test_envelope_host_equals_traced(keep_aspect, out_size, band):
    rng = np.random.default_rng(23)
    cw, y_align, x_budget = 32, 8, 126
    checked = 0
    for roi in _fuzz_rois(rng, 150):
        sx, sy, _ = image_ops._source_coords(
            jnp.asarray(roi), out_size, keep_aspect, False)
        traced = bool(pallas_warp.envelope_ok(sx, sy, cw, band,
                                              y_align, x_budget))
        host = pallas_warp.envelope_ok_host(roi, out_size, keep_aspect,
                                            cw, band, y_align, x_budget)
        # knife-edge ROIs (extent within noise of the threshold) may
        # legitimately flip between f32 grid diffs and f64 analytics
        xh, yh = pallas_warp.extents_host(roi, out_size, keep_aspect,
                                          cw)
        margin = min(abs(xh - x_budget),
                     abs(yh + (y_align - 1) - band))
        if margin < 0.05:
            continue
        checked += 1
        assert host == traced, (roi, xh, yh, band)
    assert checked > 100  # the corpus genuinely exercises both sides

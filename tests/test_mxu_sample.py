"""MXU hat-matmul sampling backends vs the exact gather path.

The hat-weight formulation is algebraically identical to two-tap
zero-border bilinear (see ops/image.py:_hat); differences are fp
reassociation only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_face.ops import image as image_ops
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"


def _roi(cx, cy, w, h, rot):
    return jnp.asarray(np.array([cx, cy, w, h, rot], np.float32))


CASES = [
    # (roi, out_size, keep_aspect, flip)  — the cascade's real geometries
    (_roi(270, 180, 540, 360, 0.0), (256, 256), True, False),   # detect
    (_roi(265.2, 143.8, 209.0, 209.0, -0.0267), (192, 192), False,
     False),                                                    # mesh
    (_roi(234.5, 110.2, 57.2, 57.2, 0.0259), (64, 64), True,
     False),                                                    # iris L
    (_roi(290.6, 108.8, 56.8, 56.8, -0.1054), (64, 64), True,
     True),                                                     # iris R
    (_roi(265.0, 143.0, 139.0, 139.0, 0.0), (112, 112), False,
     False),                                                    # embed
    # stress: larger rotation
    (_roi(265.0, 143.0, 150.0, 150.0, 0.35), (192, 192), False, False),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_mxu_matches_gather(case):
    roi, out_size, keep, flip = CASES[case]
    img = jnp.asarray(load_image(MAN))

    ref, pad_ref = jax.jit(lambda i, r: image_ops.warp_image_to_tensor(
        i, r, out_size, keep, (0.0, 1.0), flip,
        method="gather"))(img, roi)
    fast, pad_fast = jax.jit(lambda i, r: image_ops.warp_image_to_tensor(
        i, r, out_size, keep, (0.0, 1.0), flip,
        method="mxu", band=64))(img, roi)
    np.testing.assert_allclose(np.asarray(pad_fast), np.asarray(pad_ref),
                               atol=1e-7)
    # quantization (rint) makes outputs integer multiples of 1/255;
    # identical math means identical pixels except exact .5 boundaries
    diff = np.abs(np.asarray(fast) - np.asarray(ref))
    assert (diff > 1e-6).mean() < 2e-3, diff.max()
    assert diff.max() <= 1.0 / 255.0 + 1e-6


def test_separable_matches_gather_rotation_free():
    img = jnp.asarray(load_image(MAN))
    roi = _roi(270, 180, 540, 360, 0.0)
    ref, _ = jax.jit(lambda i, r: image_ops.warp_image_to_tensor(
        i, r, (256, 256), True, (-1.0, 1.0), method="gather"))(img, roi)
    fast, _ = jax.jit(lambda i, r: image_ops.warp_image_to_tensor(
        i, r, (256, 256), True, (-1.0, 1.0),
        method="separable"))(img, roi)
    diff = np.abs(np.asarray(fast) - np.asarray(ref))
    assert (diff > 1e-6).mean() < 2e-3
    assert diff.max() <= 2.0 / 255.0 + 1e-6


def test_mxu_vmap_batched_rois():
    """Distinct per-frame ROIs under vmap (the cascade's real shape)."""
    img = load_image(MAN)
    batch = jnp.asarray(np.stack([img, img[::-1].copy()]))
    rois = jnp.asarray(np.array([[265.0, 143.0, 209.0, 209.0, -0.0267],
                                 [200.0, 100.0, 150.0, 150.0, 0.1]],
                                np.float32))

    def one(method):
        return jax.jit(jax.vmap(
            lambda i, r: image_ops.warp_image_to_tensor(
                i, r, (192, 192), False, (0.0, 1.0),
                method=method)[0]))(batch, rois)

    diff = np.abs(np.asarray(one("mxu")) - np.asarray(one("gather")))
    assert diff.max() <= 1.0 / 255.0 + 1e-6


def test_pallas_interpret_matches_gather():
    """The Pallas kernel (interpreter mode on CPU) matches the exact
    gather within one uint8 quantization level."""
    img = jnp.asarray(load_image(MAN))
    for roi_t, osz, keep, flip in [
        ((265.2, 143.8, 209., 209., -0.0267), (192, 192), False, False),
        ((234.5, 110.2, 57.2, 57.2, 0.0259), (64, 64), True, False),
        ((290.6, 108.8, 56.8, 56.8, -0.1054), (64, 64), True, True),
    ]:
        roi = jnp.asarray(np.array(roi_t, np.float32))
        ref, pr = image_ops.warp_image_to_tensor(
            img, roi, osz, keep, (0., 1.), flip, method="gather")
        out, pp = image_ops.warp_image_to_tensor(
            img, roi, osz, keep, (0., 1.), flip, method="pallas",
            band=48)
        np.testing.assert_allclose(np.asarray(pp), np.asarray(pr),
                                   atol=1e-7)
        d = np.abs(np.asarray(out) - np.asarray(ref))
        assert d.max() <= 1.0 / 255.0 + 1e-6, (roi_t, d.max())


def test_pallas_multi_segment():
    """warp_sample_multi fuses several grids in one call; each segment
    equals its standalone warp."""
    from tpu_face.ops import pallas_warp
    img = jnp.asarray(load_image(MAN)).astype(jnp.float32)  # HWC
    rois = [np.array([234.5, 110.2, 57.2, 57.2, 0.0259], np.float32),
            np.array([290.6, 108.8, 56.8, 56.8, -0.1054], np.float32)]
    coords = []
    for roi, flip in zip(rois, (False, True)):
        sx, sy, _ = image_ops._source_coords(
            jnp.asarray(roi), (64, 64), True, flip)
        coords.append((sx, sy))
    fused = pallas_warp.warp_sample_multi(img, coords, band=32)
    for (sx, sy), got in zip(coords, fused):
        want = pallas_warp.warp_sample(img, sx, sy, band=32)
        assert float(jnp.abs(got).max()) > 0.1  # really sampled pixels
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_pallas_landscape_letterbox_band():
    """Code-review regression: the whole-image letterbox warp on a
    landscape frame spans max(W,H)/out_h source rows per tile AND up to
    max(W,H)/out_w source columns per 32-wide block; the auto band and
    the cw selection must both cover it.  960x368 fits the VMEM budget,
    so this genuinely exercises the kernel (1280x720 would silently
    fall back to gather and test nothing)."""
    from tpu_face.ops import pallas_warp
    assert pallas_warp.planes_fit_vmem(368, 960)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, (368, 960, 3))
                      .astype(np.uint8))
    roi = jnp.asarray(np.array([480.0, 184.0, 960.0, 368.0, 0.0],
                               np.float32))
    for out_size in [(128, 128), (256, 256)]:
        band = image_ops.auto_band(960, out_size[1])
        ref, _ = image_ops.warp_image_to_tensor(
            img, roi, out_size, True, (-1.0, 1.0), method="gather")
        out, _ = image_ops.warp_image_to_tensor(
            img, roi, out_size, True, (-1.0, 1.0), method="pallas",
            band=band)
        d = np.abs(np.asarray(out) - np.asarray(ref))
        assert d.max() <= 2.0 / 255.0 + 1e-6, (out_size, d.max())


def test_pallas_portrait_no_roll_wrap():
    """Code-review regression: x-letterboxing maps columns beyond the
    image width; the rolled window must read zero border, not pixels
    wrapped from 256 px to the left."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(1, 255, (200, 100, 3))
                      .astype(np.uint8))
    roi = jnp.asarray(np.array([50.0, 100.0, 100.0, 200.0, 0.0],
                               np.float32))
    ref, _ = image_ops.warp_image_to_tensor(
        img, roi, (64, 64), True, (0.0, 1.0), method="gather")
    out, _ = image_ops.warp_image_to_tensor(
        img, roi, (64, 64), True, (0.0, 1.0), method="pallas", band=48)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d.max() <= 1.0 / 255.0 + 1e-6, d.max()
    # the letterbox bands must be zero (all pixels are >= 1 inside)
    out = np.asarray(out)
    assert out[:, :15].max() == 0.0 and out[:, -15:].max() == 0.0

"""Fused warp/letterbox preprocessing vs OpenCV oracles.

The single-gather ``warp_image_to_tensor`` must reproduce the reference's
OpenCV chain (transform.rs:188-309) within tight tolerances: exact
coordinates for the direct-warp path, and composed-affine equivalence for
the letterbox path.
"""

import math

import cv2
import numpy as np
import pytest

from tpu_face.ops import image as image_ops


def _reference_warp(img, rect_abs, out_size):
    """OpenCV warp exactly as transform.rs:210-234 (keep_aspect=False)."""
    cx, cy, w, h, rot = rect_abs
    hw, hh = w / 2.0, h / 2.0
    pts = [(-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)]
    s, c = math.sin(rot), math.cos(rot)
    src = np.array([(cx + x * c - y * s, cy + x * s + y * c)
                    for x, y in pts], np.float32)
    wo, ho = out_size
    dst = np.array([(0, 0), (wo, 0), (wo, ho), (0, ho)], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    return cv2.warpPerspective(img, m, (wo, ho), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT)


@pytest.mark.parametrize("rot", [0.0, 0.3, -0.8])
def test_direct_warp_matches_opencv(rot):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (360, 540, 3), np.uint8)
    rect = (270.0, 180.0, 200.0, 150.0, rot)
    out, padding = image_ops.warp_image_to_tensor(
        img, np.array(rect, np.float32), (192, 192),
        keep_aspect_ratio=False, output_range=(0.0, 1.0))
    out = np.asarray(out)
    ref = _reference_warp(img.astype(np.float32), rect, (192, 192)) / 255.0
    assert np.asarray(padding).max() == 0.0
    # interior agreement (OpenCV uses 5-bit fixed-point interpolation)
    diff = np.abs(out[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert diff.max() < 0.02, diff.max()


def test_letterbox_padding_man_jpg_geometry():
    """540x360 whole-image ROI -> square: padding (0, 1/6, 0, 1/6)
    (BASELINE.md ground truth)."""
    img = np.zeros((360, 540, 3), np.uint8)
    roi = image_ops.whole_image_roi((540, 360))
    _, padding = image_ops.warp_image_to_tensor(
        img, roi, (128, 128), keep_aspect_ratio=True,
        output_range=(-1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray(padding), [0.0, 1.0 / 6.0, 0.0, 1.0 / 6.0], atol=1e-6)


def test_letterbox_content_matches_opencv_chain():
    """Full reference chain: warp -> copy_make_border -> resize -> resize."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (360, 540, 3), np.uint8).astype(np.float32)
    out, padding = image_ops.warp_image_to_tensor(
        img, image_ops.whole_image_roi((540, 360)), (128, 128),
        keep_aspect_ratio=True, output_range=(0.0, 1.0))
    out = np.asarray(out)
    # reference: whole-image roi -> roi_image == img; pad_v = 90 px;
    # resize(540,540)->noop; resize -> 128x128
    padded = cv2.copyMakeBorder(img, 90, 90, 0, 0, cv2.BORDER_CONSTANT,
                                value=0.0)
    ref = cv2.resize(padded, (128, 128), interpolation=cv2.INTER_LINEAR)
    ref /= 255.0
    diff = np.abs(out - ref)
    assert diff.max() < 0.02, diff.max()


def test_flip_horizontal_mirrors_output():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    roi = image_ops.whole_image_roi((64, 64))
    a, _ = image_ops.warp_image_to_tensor(
        img, roi, (64, 64), keep_aspect_ratio=True,
        output_range=(0.0, 1.0), flip_horizontal=False)
    b, _ = image_ops.warp_image_to_tensor(
        img, roi, (64, 64), keep_aspect_ratio=True,
        output_range=(0.0, 1.0), flip_horizontal=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:, ::-1],
                               atol=1e-6)


def test_output_range_normalization():
    img = np.full((32, 32, 3), 255, np.uint8)
    roi = image_ops.whole_image_roi((32, 32))
    out, _ = image_ops.warp_image_to_tensor(
        img, roi, (32, 32), keep_aspect_ratio=False,
        output_range=(-1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], 1.0, atol=1e-6)


def test_image_to_tensor_host_api():
    """Host-facing image_to_tensor mirrors the reference signature and
    letterbox padding (reference transform.rs:188-309)."""
    from tpu_face.ops.image import image_to_tensor
    from tpu_face.types import ImageTensor

    out = image_to_tensor("/root/reference/test_data/man.jpg",
                          output_size=(128, 128),
                          keep_aspect_ratio=True,
                          output_range=(-1.0, 1.0))
    assert isinstance(out, ImageTensor)
    assert out.tensor_data.shape == (128, 128, 3)
    assert out.original_size == (540, 360)
    # BASELINE.md: 540x360 -> square pads 1/6 top+bottom
    l, t, r, b = out.padding
    assert l == 0.0 and r == 0.0
    assert abs(t - 1.0 / 6.0) < 1e-6 and abs(b - 1.0 / 6.0) < 1e-6
    assert -1.0 <= out.tensor_data.min() and out.tensor_data.max() <= 1.0


@pytest.mark.slow
def test_warp_fuzz_roi_geometry_vs_opencv():
    """Seeded fuzz over ROI geometry (center/size/rotation, including
    partially out-of-frame ROIs): the exact gather path must track the
    OpenCV oracle, and the Pallas kernel (interpreter) must stay within
    one uint8 level of the gather whenever its envelope admits the
    geometry."""
    import jax.numpy as jnp

    from tpu_face.ops import pallas_warp

    rng = np.random.RandomState(123)
    img = rng.randint(0, 256, (360, 540, 3), np.uint8)
    imgf = img.astype(np.float32)
    for trial in range(15):
        cx = rng.uniform(-50, 590)
        cy = rng.uniform(-30, 390)
        size = rng.uniform(40, 420)
        rot = rng.uniform(-1.2, 1.2)
        rect = (cx, cy, size, size, rot)
        out, _ = image_ops.warp_image_to_tensor(
            jnp.asarray(img), jnp.asarray(np.array(rect, np.float32)),
            (192, 192), keep_aspect_ratio=False,
            output_range=(0.0, 1.0), method="gather")
        out = np.asarray(out)
        ref = _reference_warp(imgf, rect, (192, 192)) / 255.0
        # ignore a 2px frame (OpenCV 5-bit fixed point + border rules)
        diff = np.abs(out[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert diff.max() < 0.02, (trial, rect, diff.max())

        sx, sy, _ = image_ops._source_coords(
            jnp.asarray(np.array(rect, np.float32)), (192, 192),
            False, False)
        if bool(pallas_warp.envelope_ok(sx, sy, 32, 64)):
            pal = np.asarray(pallas_warp.warp_sample(
                jnp.asarray(imgf), sx, sy, band=64))
            gat = np.asarray(image_ops.bilinear_sample(
                jnp.asarray(imgf), sx, sy))
            assert np.abs(pal - gat).max() <= 1.0, (trial, rect)


def test_separable_bf16_within_one_level():
    """bf16-dot separable warp stays within one uint8 quantization
    level of the exact f32 path (the Pallas-kernel contract, now shared
    by the cascade's detection warp)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (360, 540, 3), np.uint8)
    roi = image_ops.whole_image_roi((540, 360))
    exact, _ = image_ops.warp_image_to_tensor(
        jnp.asarray(img), roi, (256, 256), keep_aspect_ratio=True,
        output_range=(-1.0, 1.0), method="separable")
    fast, _ = image_ops.warp_image_to_tensor(
        jnp.asarray(img), roi, (256, 256), keep_aspect_ratio=True,
        output_range=(-1.0, 1.0), method="separable",
        dot_dtype=jnp.bfloat16)
    # output range (-1,1): one uint8 level = 2/255
    diff = np.abs(np.asarray(fast) - np.asarray(exact)).max()
    assert diff <= 2.0 / 255.0 + 1e-6, diff


def test_load_image_float_conventions():
    """Code-review regression: float arrays must round+clip, not
    truncate/wrap; [0,1]-scaled floats are scaled up."""
    import numpy as np
    from tpu_face.utils.image_io import load_image

    u8 = np.full((4, 4, 3), 200, np.uint8)
    f01 = u8.astype(np.float32) / 255.0
    np.testing.assert_array_equal(load_image(f01), u8)
    f255 = u8.astype(np.float64) + 0.4
    np.testing.assert_array_equal(load_image(f255), u8)
    wild = np.array([[[300.0, -5.0, 254.6]]])
    np.testing.assert_array_equal(load_image(wild),
                                  [[[255, 0, 255]]])


def test_choose_warp_method_buckets_jit_keys():
    """The per-call pallas config is a jit-cache key: nearby ROIs (a
    slowly-zooming video) must map to the SAME tuple, not a fresh
    compile every few frames."""
    import numpy as np

    from tpu_face.ops import image as image_ops

    cfgs = set()
    for grow in range(0, 24, 2):   # face ROI growing 2 px per "frame"
        roi = np.array([265.0, 144.0, 209.0 + grow, 209.0 + grow,
                        0.03], np.float32)
        cfg = image_ops.choose_warp_method("pallas", roi, (540, 360),
                                           (192, 192), False)
        assert isinstance(cfg, tuple)
        cfgs.add(cfg)
    assert len(cfgs) <= 2, cfgs  # 32-row band buckets bound the keys

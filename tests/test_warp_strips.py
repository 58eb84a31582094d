"""Large-frame warp: the strip-DMA Pallas path (HBM-resident planes).

Beyond ~720p the padded frame planes no longer fit VMEM; the kernel
switches to per-block strip DMAs (ops/pallas_warp._warp_kernel_strips).
Semantics must stay identical to the exact gather (reference warp
transform.rs:210-234 at any size) within one uint8 quantization level,
and the cascade must keep its Pallas fast path at 1080p.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_face.ops import image as image_ops
from tpu_face.ops import pallas_warp


@pytest.fixture(scope="module")
def frame_1080p():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (1080, 1920, 3), np.uint8)


def test_1080p_planes_use_strip_path(frame_1080p):
    """The residency switch actually selects strips at 1080p."""
    assert not pallas_warp.planes_fit_vmem(1080, 1920)
    assert pallas_warp.planes_fit_vmem(720, 1280)


@pytest.mark.parametrize("rot", [0.0, 0.3, -0.5])
def test_strip_warp_matches_gather_1080p(frame_1080p, rot):
    img = jnp.asarray(frame_1080p, jnp.float32)
    roi = jnp.array([960.0, 540.0, 520.0, 520.0, rot], jnp.float32)
    sx, sy, _ = image_ops._source_coords(roi, (192, 192), False, False)
    assert bool(pallas_warp.envelope_ok(sx, sy, 32, 80))
    out = pallas_warp.warp_sample(img, sx, sy, band=80)
    ref = image_ops.bilinear_sample(img, sx, sy)
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert diff <= 1.0, diff  # one uint8 quantization level


def test_strip_warp_multi_two_grids_1080p(frame_1080p):
    """Both iris crops in one strip-DMA call, like the cascade issues."""
    img = jnp.asarray(frame_1080p, jnp.float32)
    left = jnp.array([800.0, 500.0, 160.0, 160.0, 0.1], jnp.float32)
    right = jnp.array([1100.0, 500.0, 150.0, 150.0, -0.2], jnp.float32)
    lx, ly, _ = image_ops._source_coords(left, (64, 64), True, False)
    rx, ry, _ = image_ops._source_coords(right, (64, 64), True, True)
    lt, rt = pallas_warp.warp_sample_multi(img, [(lx, ly), (rx, ry)],
                                           band=48)
    ref_l = image_ops.bilinear_sample(img, lx, ly)
    ref_r = image_ops.bilinear_sample(img, rx, ry)
    assert np.abs(np.asarray(lt) - np.asarray(ref_l)).max() <= 1.0
    assert np.abs(np.asarray(rt) - np.asarray(ref_r)).max() <= 1.0


def test_strip_warp_frame_edges(frame_1080p):
    """ROIs hugging frame corners exercise the ystart/xa clamps and the
    zero-border tap masking on the strip path."""
    img = jnp.asarray(frame_1080p, jnp.float32)
    for cx, cy in [(40.0, 40.0), (1880.0, 1040.0), (40.0, 1040.0)]:
        roi = jnp.array([cx, cy, 300.0, 300.0, 0.2], jnp.float32)
        sx, sy, _ = image_ops._source_coords(roi, (192, 192), False,
                                             False)
        out = pallas_warp.warp_sample(img, sx, sy, band=48)
        ref = image_ops.bilinear_sample(img, sx, sy)
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() <= 1.0


def test_strip_warp_vmapped_batch(frame_1080p):
    """vmap over frames flattens into the kernel's group grid axis
    (custom_vmap rule): every batch item samples its OWN planes."""
    import jax

    rng = np.random.RandomState(7)
    frames = np.stack([frame_1080p,
                       rng.randint(0, 256, frame_1080p.shape, np.uint8)])
    imgs = jnp.asarray(frames, jnp.float32)
    rois = jnp.array([[900.0, 500.0, 400.0, 400.0, 0.2],
                      [1000.0, 600.0, 480.0, 480.0, -0.3]], jnp.float32)

    def one(img, roi):
        sx, sy, _ = image_ops._source_coords(roi, (192, 192), False,
                                             False)
        return pallas_warp.warp_sample(img, sx, sy, band=80)

    batched = jax.vmap(one)(imgs, rois)
    for i in range(2):
        ref = one(imgs[i], rois[i])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_strip_warp_nested_vmap_faces_share_planes(frame_1080p):
    """The cascade's nesting: inner vmap over faces (planes shared,
    in_axes None), outer vmap over frames."""
    import jax

    rng = np.random.RandomState(9)
    frames = np.stack([frame_1080p,
                       rng.randint(0, 256, frame_1080p.shape, np.uint8)])
    imgs = jnp.asarray(frames, jnp.float32)
    rois = jnp.array([[[700.0, 400.0, 300.0, 300.0, 0.1],
                       [1300.0, 700.0, 350.0, 350.0, -0.2]],
                      [[500.0, 300.0, 320.0, 320.0, 0.3],
                       [1500.0, 800.0, 280.0, 280.0, 0.0]]], jnp.float32)

    def per_face(planes, roi):
        sx, sy, _ = image_ops._source_coords(roi, (192, 192), False,
                                             False)
        (out,) = pallas_warp.warp_sample_multi(None, [(sx, sy)],
                                               band=80, planes=planes)
        return out

    def per_frame(img, frois):
        planes = pallas_warp.make_planes(img, band=80)
        return jax.vmap(per_face, in_axes=(None, 0))(planes, frois)

    nested = jax.vmap(per_frame)(imgs, rois)
    for i in range(2):
        for f in range(2):
            sx, sy, _ = image_ops._source_coords(
                rois[i, f], (192, 192), False, False)
            ref = image_ops.bilinear_sample(imgs[i], sx, sy)
            assert np.abs(np.asarray(nested[i, f])
                          - np.asarray(ref)).max() <= 1.0


@pytest.fixture(scope="module")
def man_on_1080p():
    """man.jpg pasted (2x-scaled) onto a black 1080p canvas."""
    from tpu_face.utils.image_io import load_image

    man = load_image("/root/reference/test_data/man.jpg")
    # nearest-neighbour 2x upscale keeps the fixture dependency-free
    big = np.repeat(np.repeat(man, 2, axis=0), 2, axis=1)  # 720x1080
    canvas = np.zeros((1080, 1920, 3), np.uint8)
    canvas[180:900, 420:1500] = big
    return canvas


def test_cascade_1080p_pallas_matches_gather(man_on_1080p):
    """Full cascade at 1080p: the Pallas strip path stays within budget
    of the exact gather path and keeps envelope_ok True."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    ref = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                      warp_method="gather").infer_batch(man_on_1080p)
    out = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                      warp_method="pallas").infer_batch(man_on_1080p)
    assert bool(np.asarray(ref.mesh_valid[0]))
    assert bool(np.asarray(out.mesh_valid[0]))
    assert bool(np.asarray(out.envelope_ok[0]))
    mesh_px = np.abs((np.asarray(out.mesh[0]) - np.asarray(ref.mesh[0]))
                     * np.array([1920.0, 1080.0, 1920.0]))
    assert mesh_px.max() <= 1.0, mesh_px.max()
    iris_px = np.abs((np.asarray(out.iris[0]) - np.asarray(ref.iris[0]))
                     * np.array([1920.0, 1080.0, 1920.0]))
    assert iris_px.max() <= 1.0, iris_px.max()


def test_cascade_strips_multiface():
    """Full cascade on a >VMEM-threshold frame with max_faces=2: the
    strips kernel under the cascade's nested faces+batch vmap."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    man = load_image("/root/reference/test_data/man.jpg")
    crop = man[40:260, 160:380]  # face crop, 220x220
    canvas = np.zeros((900, 1440, 3), np.uint8)
    canvas[160:380, 200:420] = crop
    canvas[500:720, 900:1120] = crop
    from tpu_face.ops.pallas_warp import planes_fit_vmem
    assert not planes_fit_vmem(900, 1440)

    ref = FaceCascade(FaceDetectionModel.FULL_SPARSE, max_faces=2,
                      warp_method="gather").infer_batch(canvas)
    out = FaceCascade(FaceDetectionModel.FULL_SPARSE, max_faces=2,
                      warp_method="pallas").infer_batch(canvas)
    rv = np.asarray(ref.mesh_valid[0])
    ov = np.asarray(out.mesh_valid[0])
    assert rv.sum() == 2 and ov.sum() == 2
    assert np.asarray(out.envelope_ok[0]).all()
    mesh_px = np.abs((np.asarray(out.mesh[0]) - np.asarray(ref.mesh[0]))
                     * np.array([1440.0, 900.0, 1440.0]))
    assert mesh_px.max() <= 1.0, mesh_px.max()


def test_standalone_models_dispatch_oversized_roi_to_gather():
    """Standalone host APIs have concrete ROIs: a 'pallas' request whose
    geometry exceeds the kernel envelope must produce the exact-gather
    result (host-side dispatch), not silently clamped taps."""
    from tpu_face.models import FaceLandmark
    from tpu_face.ops.pallas_warp import envelope_ok_host
    from tpu_face.types import Rect
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    # ROI 3.2x the frame width: far beyond any 128-lane x-window
    huge = Rect(0.5, 0.5, 3.2, 3.2, 0.3, normalized=True)
    assert not envelope_ok_host(
        np.array([270.0, 180.0, 3.2 * 540, 3.2 * 360, 0.3]),
        (192, 192), False, 32, 64)
    ref = FaceLandmark(warp_method="gather")
    out = FaceLandmark(warp_method="pallas")
    a = ref.infer(img, huge)
    b = out.infer(img, huge)
    assert len(a) == len(b)
    if a:  # presence may legitimately be low on a mostly-empty crop
        pts_a = np.array([[p.x, p.y] for p in a])
        pts_b = np.array([[p.x, p.y] for p in b])
        np.testing.assert_allclose(pts_b, pts_a, atol=1e-5)


def test_envelope_flag_rejects_oversized_roi():
    """A ROI whose per-block source extent exceeds the static windows
    must report envelope_ok=False (the jitted cascade folds this into
    mesh_valid instead of silently clamping taps — silent-clamp fix)."""
    huge = jnp.array([960.0, 540.0, 1600.0, 1600.0, 0.0], jnp.float32)
    sx, sy, _ = image_ops._source_coords(huge, (192, 192), False, False)
    assert not bool(pallas_warp.envelope_ok(sx, sy, 32, 64))
    ok = jnp.array([960.0, 540.0, 600.0, 600.0, 0.0], jnp.float32)
    sx, sy, _ = image_ops._source_coords(ok, (192, 192), False, False)
    assert bool(pallas_warp.envelope_ok(sx, sy, 32, 64))


def test_wide_xload_covers_4k_scale_rois():
    """A 4K-class close-up face warps at mesh-ROI scales ~8x the 192
    output — beyond the rolled 128-lane window.  The cw=16 / 512-lane
    wide window (pipeline._warp_cfg beyond 2560 px) must sample it
    exactly (within the bf16-dot uint8 level), and the envelope math
    must agree: out of envelope for the default window, in for wide."""
    import jax.numpy as jnp

    from tpu_face.ops import image as image_ops
    from tpu_face.ops.pallas_warp import (envelope_ok, make_planes,
                                          warp_sample_multi)

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 255, (1620, 2880, 3)
                                   ).astype(np.uint8))
    roi = jnp.asarray(np.array([1440.0, 810.0, 1500.0, 1500.0, 0.15],
                               np.float32))
    sx, sy, _ = image_ops._source_coords(roi, (192, 192), False, False)

    assert not bool(envelope_ok(sx, sy, 32, 128, 8, 126))       # rolled
    assert bool(envelope_ok(sx, sy, 16, 192, 16, 512 - 129))    # wide

    planes = make_planes(img, band=192, dtype=jnp.bfloat16)
    assert not isinstance(planes, list)      # strips mode (bf16, big)
    (out,) = warp_sample_multi(None, [(sx, sy)], band=192,
                               planes=planes, cw=16, xload=512,
                               interpret=True)
    exact = image_ops.bilinear_sample(img.astype(jnp.float32), sx, sy)
    assert float(jnp.max(jnp.abs(out - exact))) <= 1.0


@pytest.mark.slow
def test_cascade_4k_scale_face_keeps_fast_path():
    """Fused cascade on a >2560 px frame with a close-up face: the
    pallas path must match the gather path within budget and keep
    envelope_ok True (it used to flag every 4K close-up)."""
    from PIL import Image

    from tpu_face.pipeline import FaceCascade

    man = np.asarray(Image.open("/root/reference/test_data/man.jpg").convert("RGB")
                     .resize((2880, 1920), Image.BILINEAR), np.uint8)
    canvas = man[None]
    ref = FaceCascade(warp_method="gather").infer_batch(canvas)
    out = FaceCascade(warp_method="pallas").infer_batch(canvas)
    assert bool(ref.mesh_valid[0]) and bool(out.mesh_valid[0])
    assert bool(out.envelope_ok[0])
    mesh_px = np.abs((np.asarray(out.mesh[0]) - np.asarray(ref.mesh[0]))
                     * np.array([2880.0, 1920.0, 2880.0]))
    assert mesh_px.max() <= 2.0, mesh_px.max()


def test_standalone_mesh_4k_roi_uses_wide_window():
    """FaceLandmark on a 4K-scale frame with a close-up ROI: the host
    dispatch must pick the wide 512-lane pallas config (not gather) and
    match the gather output within the bf16-dot budget."""
    from PIL import Image

    from tpu_face.models import FaceLandmark
    from tpu_face.types import Rect

    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB").resize((2880, 1920),
                                            Image.BILINEAR), np.uint8)
    roi = Rect(0.49, 0.40, 0.39 * 2880 / 2880, 0.58 * 1920 / 1920,
               -0.0267, normalized=True)
    roi_abs = np.array([0.49 * 2880, 0.40 * 1920, 0.39 * 2880,
                        0.58 * 1920, -0.0267], np.float32)
    cfg = image_ops.choose_warp_method("pallas", roi_abs, (2880, 1920),
                                       (192, 192), False)
    assert isinstance(cfg, tuple) and cfg[2] == 512, cfg

    ref = FaceLandmark(warp_method="gather").infer(img, roi)
    out = FaceLandmark(warp_method="pallas").infer(img, roi)
    assert len(ref) == 468 and len(out) == 468
    d = max(max(abs(a.x - b.x) * 2880, abs(a.y - b.y) * 1920)
            for a, b in zip(ref, out))
    assert d <= 2.0, d


def test_warp_cfg_and_band_tiers():
    """The three warp-config tiers are deliberate, probe-backed
    choices (tools/tpu_540p_rt_probe.py, tpu_1080p_rt_probe.py,
    tpu_4k_rt_probe.py) — changing them must be a conscious act."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    c = FaceCascade(FaceDetectionModel.SHORT)
    # VMEM-resident (540p): rt16, bands 96/72
    assert c._warp_cfg((540, 360)) == (32, 256, 126, 16)
    assert FaceCascade._bands((540, 360)) == (96, 72)
    # residency edge (720p): mesh band grows toward 136
    assert FaceCascade._bands((1280, 720)) == (136, 72)
    # HBM strips (1080p): rt16, constant 144 (x-envelope-matched)
    assert c._warp_cfg((1920, 1080)) == (32, 256, 126, 16)
    assert FaceCascade._bands((1920, 1080)) == (144, 144)
    # >2560 wide-window tier: rt8, maxdim-scaled bands
    cw, xload, xb, rt = c._warp_cfg((3840, 2160))
    assert (cw, xload, rt) == (16, 512, 8)
    assert FaceCascade._bands((3840, 2160)) == (192, 192)
    # opt-in "speed" profile: rt32 in the RESIDENT tier only
    cs = FaceCascade(FaceDetectionModel.SHORT, warp_profile="speed")
    assert cs._warp_cfg((540, 360)) == (32, 256, 126, 32)
    assert cs._warp_cfg((1920, 1080)) == (32, 256, 126, 16)


@pytest.mark.slow
def test_auto_profile_dispatch():
    """warp_profile='auto': per-batch HLO conds pick the rt32 speed
    config when every face's exact ROI fits its envelope, and the
    rt16 coverage config otherwise — no coverage loss, no host sync."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    auto = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                       warp_method="pallas", warp_profile="auto")
    speed = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                        warp_method="pallas", warp_profile="speed")
    cov = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                      warp_method="pallas")

    # small face: the rt32 branch runs -> identical to the speed
    # profile (same kernels, same configs)
    ra = auto.infer_batch(img[None])
    rs = speed.infer_batch(img[None])
    assert bool(ra.mesh_valid[0]) and bool(ra.envelope_ok[0])
    np.testing.assert_allclose(np.asarray(ra.mesh),
                               np.asarray(rs.mesh), atol=1e-6)
    mesh = np.asarray(ra.mesh_raw[0])
    assert abs(mesh[1, 0] * 540 - 263.85) <= 1.0
    assert abs(mesh[1, 1] * 360 - 143.37) <= 1.0

    # near-full-frame face: mesh ROI exceeds the rt32 envelope -> the
    # rt16 branch runs -> identical to the coverage profile, and the
    # face stays VALID (a hard speed profile would flag it)
    from PIL import Image
    big = np.asarray(Image.fromarray(img[64:244, 175:355])
                     .resize((540, 360), Image.BILINEAR), np.uint8)
    rb = auto.infer_batch(big[None])
    rc = cov.infer_batch(big[None])
    assert bool(rb.face_valid[0])
    roi_h = float(np.asarray(rb.face_roi[0])[3]) * 360
    assert roi_h > 522, roi_h          # genuinely beyond rt32's y-cap
    # the MESH cond took the rt16 branch: raw mesh identical to
    # coverage.  (The iris cond decides independently on the exact eye
    # ROIs — either branch stays within kernel-rounding of the other,
    # so the refined mesh is compared at the one-uint8-level budget.)
    np.testing.assert_allclose(np.asarray(rb.mesh_raw),
                               np.asarray(rc.mesh_raw), atol=1e-6)
    d_px = np.abs(np.asarray(rb.mesh) - np.asarray(rc.mesh)) \
        * np.array([540.0, 360.0, 540.0])
    assert d_px.max() <= 0.5, d_px.max()
    assert bool(rb.mesh_valid[0])      # rt16 branch keeps it valid
    rsb = speed.infer_batch(big[None])
    assert not bool(rsb.envelope_ok[0])  # the hard profile flags it

    # the lowered program contains the two real branch points
    fn = auto._get_jitted(360, 540)
    text = fn.lower(jax.ShapeDtypeStruct((1, 360, 540, 3), np.uint8)
                    ).as_text()
    n_cond = text.count("stablehlo.case") + text.count("stablehlo.if")
    assert n_cond >= 2, n_cond


def test_auto_profile_multiface_lowers_rt_conditionals():
    """The auto profile's per-batch rt dispatch covers max_faces > 1
    too (all K faces of all frames vote on the predicates): the
    lowered K-face program carries the two rt branch points instead
    of silently falling back to the coverage config."""
    import jax

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    auto = FaceCascade(FaceDetectionModel.SHORT, max_faces=2,
                       warp_method="pallas", warp_profile="auto")
    text = auto._get_jitted(360, 540).lower(
        jax.ShapeDtypeStruct((1, 360, 540, 3), np.uint8)).as_text()
    n_cond = text.count("stablehlo.case") + text.count("stablehlo.if")
    assert n_cond >= 2, n_cond


@pytest.mark.slow
def test_auto_profile_multiface_matches_coverage():
    """K-face auto dispatch end-to-end on a crowded scene: same valid
    faces and meshes (within the kernel-rounding budget) as the
    coverage profile, with per-face results in matching slots."""
    from PIL import Image

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    crop = img[50:240, 170:360]
    ch, cw_ = crop.shape[:2]
    canvas = np.zeros((2 * ch, 2 * cw_, 3), np.uint8)
    for r in range(2):
        for c in range(2):
            canvas[r * ch:(r + 1) * ch, c * cw_:(c + 1) * cw_] = crop
    h, w = canvas.shape[:2]

    kw = dict(max_faces=4, nms_top_m=512, warp_method="pallas")
    ra = FaceCascade(FaceDetectionModel.FULL_SPARSE,
                     warp_profile="auto", **kw).infer_batch(
                         canvas[None])
    rc = FaceCascade(FaceDetectionModel.FULL_SPARSE,
                     warp_profile="coverage", **kw).infer_batch(
                         canvas[None])
    va, vc = np.asarray(ra.mesh_valid[0]), np.asarray(rc.mesh_valid[0])
    assert va.sum() == 4 and (va == vc).all()
    d_px = np.abs(np.asarray(ra.mesh[0]) - np.asarray(rc.mesh[0])) \
        * np.array([float(w), float(h), float(w)])
    assert d_px[va].max() <= 1.0, d_px[va].max()


def test_speed_profile_accuracy_on_baseline():
    """warp_profile='speed' (rt32 resident) keeps the BASELINE parity
    on man.jpg (the probe's measured config)."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    out = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                      warp_method="pallas",
                      warp_profile="speed").infer_batch(img[None])
    assert bool(out.mesh_valid[0]) and bool(out.envelope_ok[0])
    mesh = np.asarray(out.mesh_raw[0])
    assert abs(mesh[1, 0] * 540 - 263.85) <= 1.0
    assert abs(mesh[1, 1] * 360 - 143.37) <= 1.0


def test_warp_cfg_narrow_tall_frame_budget():
    """A >2560-px-tall but narrow frame cannot load 512 lanes; the
    cascade's warp config must shrink the x-budget with the padded
    plane width instead of over-promising the envelope."""
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    c = FaceCascade(FaceDetectionModel.SHORT)
    cw, xload, x_budget, rt = c._warp_cfg((300, 2700))
    assert xload == 384 and x_budget == 384 - 129
    cw, xload, x_budget, rt = c._warp_cfg((2160, 3840))
    assert xload == 512 and x_budget == 383
    cw, xload, x_budget, rt = c._warp_cfg((540, 360))
    assert (cw, xload, x_budget, rt) == (32, 256, 126, 16)

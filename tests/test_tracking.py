"""FaceTracker video mode: detection-free tracking loop.

The tracked path derives each frame's mesh ROI from the previous
frame's landmarks (MediaPipe's production loop; the reference has no
video mode).  Tracked meshes must match the full per-frame cascade
within a small pixel budget, and loss/recovery must behave.
"""

import numpy as np
import pytest

from tpu_face.models.face_detection import FaceDetectionModel
from tpu_face.pipeline import FaceCascade
from tpu_face.tracking import FaceTracker, roi_from_mesh
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"


@pytest.fixture(scope="module")
def video():
    """Synthetic pan: man.jpg circularly shifted a few px per frame."""
    img = load_image(MAN)
    return [np.roll(np.roll(img, 3 * i, axis=1), 2 * i, axis=0)
            for i in range(5)]


def test_tracker_locks_then_tracks(video):
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA)
    for i, frame in enumerate(video):
        res = tracker.step(frame)
        assert bool(np.asarray(res.mesh_valid[0])), i
        assert tracker.tracking.all(), i
        full = cascade.infer_batch(frame[None])
        dn = np.abs((np.asarray(res.mesh[0]) - np.asarray(full.mesh[0]))
                    * np.array([540.0, 360.0, 540.0]))
        # tracked ROI differs from the detection ROI (landmark bbox vs
        # detection bbox), so meshes agree to a few px, not exactly
        assert dn[:, :2].max() <= 3.0, (i, dn[:, :2].max())


def test_tracker_loss_and_recovery(video):
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    res = tracker.step(video[0])
    assert tracker.tracking.all()
    # lost: black frame -> invalid, next step redetects
    res = tracker.step(np.zeros_like(video[0]))
    assert not bool(np.asarray(res.mesh_valid[0]))
    assert not tracker.tracking.any()
    res = tracker.step(video[1])
    assert bool(np.asarray(res.mesh_valid[0]))
    assert tracker.tracking.all()


def test_tracker_batch_streams(video):
    """Two parallel streams with independent state."""
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    batch0 = np.stack([video[0], video[1]])
    res = tracker.step(batch0)
    assert np.asarray(res.mesh_valid).all()
    assert tracker.tracking.shape == (2,)
    # one stream goes black: batch falls back to the full path and the
    # black stream is invalid while the live one stays valid
    batch1 = np.stack([video[2], np.zeros_like(video[0])])
    res = tracker.step(batch1)
    valid = np.asarray(res.mesh_valid)
    assert bool(valid[0]) and not bool(valid[1])


@pytest.mark.slow
def test_tracker_churn_repair(video):
    """Per-stream lock churn: one stream goes dark each step.  The
    repair sub-batch re-detects lost streams IN-step (entry-lost
    streams regain validity the moment their frame is good again)
    while the other streams stay on the tracked path."""
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          repair_batch=2)
    b = 4
    frames = np.stack([video[i % len(video)] for i in range(b)])
    tracker.step(frames)                   # full detect (fresh state)
    assert tracker.tracking.all()
    for step in range(4):
        kill = step % b
        cur = frames.copy()
        cur[kill] = 0
        res = tracker.step(cur)
        valid = np.asarray(res.mesh_valid)
        # the darkened stream is invalid this step...
        assert not valid[kill], step
        # ...every other stream (including last step's victim, whose
        # state was invalid at entry: repaired in-step) is valid
        others = [i for i in range(b) if i != kill]
        assert valid[others].all(), (step, valid)


def test_unrepaired_lost_stream_not_phantom_valid(video):
    """A lost stream beyond the repair budget must NOT surface
    face_valid=True / score=1.0 from its dummy-ROI tracked pass
    (round-3 review finding)."""
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          repair_batch=1)
    b = 4
    frames = np.stack([video[i % len(video)] for i in range(b)])
    tracker.step(frames)
    assert tracker.tracking.all()
    cur = frames.copy()
    cur[3] = 0                      # stream 3 lost (repaired, fails)
    tracker.step(cur)
    # stream 3 enters invalid AND stream 0 goes dark mid-step; the
    # single repair slot goes to stream 0 (stable argsort), leaving
    # stream 3 on the dummy-ROI tracked path
    cur = frames.copy()
    cur[0] = 0
    res = tracker.step(cur)
    fv = np.asarray(res.face_valid)
    sc = np.asarray(res.score)
    mv = np.asarray(res.mesh_valid)
    assert not fv[3] and sc[3] < 0.5 and not mv[3]
    assert not fv[0] and not mv[0]  # dark frame: detection fails
    assert fv[1] and fv[2] and mv[1] and mv[2]


def test_tracker_step_lowers_real_conditionals():
    """The detector skip is a genuine HLO conditional, not masking:
    the lowered step contains both branch points (full-vs-tracked and
    the repair gate), so the detector CNN truly does not execute while
    streams stay locked."""
    import jax

    tracker = FaceTracker(FaceDetectionModel.SHORT, repair_batch=1)
    fn = tracker._get_jitted((360, 540))
    args = (jax.ShapeDtypeStruct((2, 360, 540, 3), np.uint8),
            jax.ShapeDtypeStruct((2, 5), np.float32),
            jax.ShapeDtypeStruct((2,), np.bool_),
            jax.ShapeDtypeStruct((), np.bool_))
    text = fn.lower(*args).as_text()
    n_cond = text.count("stablehlo.case") + text.count("stablehlo.if")
    assert n_cond >= 2, n_cond


@pytest.mark.slow
def test_tracker_random_churn_invariants(video):
    """Seeded random loss patterns over many steps: whatever the
    dark-frame pattern, (a) a dark frame is never a valid face,
    (b) a stream with a good frame AND valid entry state stays valid,
    (c) a stream whose frame is good recovers within 2 steps of its
    darkness ending (repair or full path), (d) everything finite."""
    rng = np.random.default_rng(99)
    b = 6
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          repair_batch=2)
    frames = np.stack([video[i % len(video)] for i in range(b)])
    dark_since = np.full(b, -10)
    prev_valid = np.zeros(b, bool)
    for step in range(12):
        dark = rng.random(b) < 0.25
        cur = frames.copy()
        cur[dark] = 0
        res = tracker.step(cur)
        valid = np.asarray(res.mesh_valid)
        fv = np.asarray(res.face_valid)
        assert np.isfinite(np.asarray(res.mesh)).all()
        for i in range(b):
            if dark[i]:
                assert not valid[i], (step, i)   # (a)
                dark_since[i] = step
            else:
                if prev_valid[i]:
                    assert valid[i], (step, i)   # (b) tracked fine
                elif step - dark_since[i] >= 2:
                    assert valid[i] or fv[i], (step, i)  # (c)
        prev_valid = valid


def test_tracker_mass_loss_full_path(video):
    """More simultaneous losses than the repair batch: the step falls
    back to full detection for everyone and recovers the whole batch
    the next step."""
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          repair_batch=1)
    b = 4
    frames = np.stack([video[i % len(video)] for i in range(b)])
    tracker.step(frames)
    assert tracker.tracking.all()
    tracker.step(np.zeros_like(frames))    # all streams lose lock
    assert not tracker.tracking.any()
    res = tracker.step(frames)             # mass loss -> full path
    assert np.asarray(res.mesh_valid).all()
    assert tracker.tracking.all()


def test_redetect_every_forces_detection(video):
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          redetect_every=2)
    for frame in video:
        res = tracker.step(frame)
        assert bool(np.asarray(res.mesh_valid[0]))


def test_roi_from_mesh_matches_cascade_roi(video):
    """The landmark-derived ROI lands near the detection-derived one
    (same face, scale 1.5 square-long on slightly different boxes)."""
    cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA)
    full = cascade.infer_batch(video[0][None])
    roi = np.asarray(roi_from_mesh(full.mesh[0], (540, 360)))
    ref = np.asarray(full.face_roi[0]) * np.array(
        [540.0, 360.0, 540.0, 360.0, 1.0])
    assert abs(roi[0] - ref[0]) < 15 and abs(roi[1] - ref[1]) < 15
    assert 0.75 < roi[2] / ref[2] < 1.3
    assert abs(roi[4] - ref[4]) < 0.15


@pytest.mark.slow
def test_tracker_resolution_change_resets_state(video):
    """Absolute-pixel ROIs from one resolution must not be reused on
    another: switching frame size forces a clean re-detect."""
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    tracker.step(video[0])
    assert tracker.tracking.all()
    big = np.repeat(np.repeat(video[1], 2, axis=0), 2, axis=1)
    res = tracker.step(big)  # 720x1080: state must reset, then detect
    assert bool(np.asarray(res.mesh_valid[0]))
    nose = np.asarray(res.mesh[0][1]) * np.array([1080.0, 720.0, 1.0])
    # ~2x the 540p nose position (detection-accurate, not stale-ROI)
    assert abs(nose[0] - 2 * 266.9) < 8 and abs(nose[1] - 2 * 145.4) < 8


def test_tracker_reset(video):
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    tracker.step(video[0])
    assert tracker.tracking.all()
    tracker.reset()
    assert tracker.tracking.shape == (0,)
    tracker.step(video[1])
    assert tracker.tracking.all()


@pytest.mark.slow
def test_tracker_auto_profile_is_the_fused_tracked_program():
    """The tracked path does NOT dispatch rt per batch under
    warp_profile='auto': the dispatch was built and measured a net
    loss (cond-boundary plane copies > rt32 warp savings — closed
    negative, tracking.py note above _step_fn), so the auto tracker
    must lower the SAME program as the coverage tracker, keeping only
    the full-vs-tracked and repair branch points."""
    import jax

    args = (jax.ShapeDtypeStruct((2, 360, 540, 3), np.uint8),
            jax.ShapeDtypeStruct((2, 5), np.float32),
            jax.ShapeDtypeStruct((2,), np.bool_),
            jax.ShapeDtypeStruct((), np.bool_))
    texts = {}
    for profile in ("auto", "coverage"):
        t = FaceTracker(FaceDetectionModel.SHORT, repair_batch=1,
                        warp_method="pallas", warp_profile=profile)
        texts[profile] = t._get_jitted((360, 540)).lower(
            *args).as_text()
    assert texts["auto"] == texts["coverage"]
    n_cond = (texts["auto"].count("stablehlo.case")
              + texts["auto"].count("stablehlo.if"))
    assert n_cond >= 2, n_cond


@pytest.mark.slow
def test_tracker_near_fullframe_face_stays_locked(video):
    """The default-profile tracker holds lock on ordinary video, and a
    near-full-frame face (state ROI beyond the rt32 y-envelope — the
    geometry that killed the hard 'speed' profile's lock) stays locked
    and VALID across tracked steps on the coverage-envelope rt16
    configs the tracked path always uses."""
    ta = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                     warp_method="pallas")
    for i, frame in enumerate(video):
        ra = ta.step(frame)
        assert bool(np.asarray(ra.mesh_valid[0])), i
        assert ta.tracking.all(), i

    # near-full-frame face: the state ROI exceeds the rt32 y-envelope;
    # the tracked path's rt16 coverage config must keep it valid
    from PIL import Image
    img = load_image(MAN)
    big = np.asarray(Image.fromarray(img[74:234, 185:345])
                     .resize((540, 360), Image.BILINEAR), np.uint8)
    big_video = [np.roll(big, 2 * i, axis=1) for i in range(3)]
    ta.reset()
    for i, frame in enumerate(big_video):
        ra = ta.step(frame)
        assert bool(np.asarray(ra.mesh_valid[0])), i
        assert ta.tracking.all(), i
    roi_h = float(np.asarray(ra.face_roi[0])[3]) * 360
    assert roi_h > 522, roi_h      # genuinely beyond rt32's y-cap


def test_tracker_planar_matches_hwc(video):
    """Planar ingestion in video mode: identical lock state and meshes
    to the HWC tracker on the same stream."""
    t_h = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    t_p = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                      input_layout="planar")
    for frame in video:
        rh = t_h.step(frame[None])
        rp = t_p.step(np.ascontiguousarray(
            frame[None].transpose(0, 3, 1, 2)))
        np.testing.assert_array_equal(np.asarray(rh.mesh_valid),
                                      np.asarray(rp.mesh_valid))
        np.testing.assert_allclose(np.asarray(rh.mesh),
                                   np.asarray(rp.mesh), atol=1e-6)
    assert t_p.tracking.all()


@pytest.fixture(scope="module")
def two_face_video():
    """Two russ_cox faces composited side by side, panning slowly."""
    from PIL import Image
    a = Image.open("/root/reference/test_data/russ_cox_1.jpg")
    b = Image.open("/root/reference/test_data/russ_cox_2.jpg")
    size = (200, 225)
    comp = np.concatenate(
        [np.asarray(a.convert("RGB").resize(size)),
         np.asarray(b.convert("RGB").resize(size))], axis=1)
    return [np.roll(comp, 2 * i, axis=1) for i in range(4)]


def test_multiface_tracker_locks_and_tracks(two_face_video):
    from tpu_face.pipeline import FaceCascade
    from tpu_face.tracking import MultiFaceTracker

    tracker = MultiFaceTracker(FaceDetectionModel.FULL, max_faces=4)
    cascade = FaceCascade(FaceDetectionModel.FULL, max_faces=4)
    r0 = tracker.step(two_face_video[0][None])     # detect + lock
    assert tracker.tracking.all()
    assert tracker.face_count[0] == 2
    for frame in two_face_video[1:]:
        r = tracker.step(frame[None])
        assert tracker.tracking.all()
        ref = cascade.infer_batch(frame[None])
        # both tracked meshes match the per-frame cascade within a
        # small pixel budget (tracked ROIs come from the previous
        # frame, so they differ slightly from detector-derived ROIs)
        w, h = 400, 225
        for k in range(2):
            assert bool(r.mesh_valid[0, k])
            d = np.abs((np.asarray(r.mesh[0, k])
                        - np.asarray(ref.mesh[0, k]))
                       * np.array([w, h, w]))
            assert d.max() <= 3.0, (k, d.max())


def test_match_slots_unit():
    """Greedy IoU slot assignment: survivors keep slots, entries fill
    empty slots in score order, no-previous-state = identity."""
    import jax.numpy as jnp

    from tpu_face.tracking import match_slots

    def roi(cx, cy, s=40.0):
        return [cx, cy, s, s, 0.0]

    # prev: slot0 = face A @ (100,100), slot1 = face B @ (300,100)
    prev = jnp.array([roi(100, 100), roi(300, 100), roi(0, 0),
                      roi(0, 0)], jnp.float32)
    pval = jnp.array([True, True, False, False])
    # new NMS order: B first (higher score), then A, then entry C
    new = jnp.array([roi(302, 101), roi(99, 102), roi(200, 200),
                     roi(0, 0)], jnp.float32)
    nval = jnp.array([True, True, True, False])
    perm = np.asarray(match_slots(new, nval, prev, pval))
    assert perm[0] == 1      # slot0 keeps face A (new index 1)
    assert perm[1] == 0      # slot1 keeps face B (new index 0)
    assert perm[2] == 2      # entry C fills the first empty slot
    # identity when no previous slots are valid
    perm0 = np.asarray(match_slots(new, nval, prev,
                                   jnp.zeros(4, bool)))
    np.testing.assert_array_equal(perm0, [0, 1, 2, 3])


def test_multiface_scene_entry_keeps_slots(two_face_video):
    """A face entering mid-stream is acquired at the next redetect in
    an EMPTY slot; the already-tracked face's slot is unchanged."""
    from tpu_face.tracking import MultiFaceTracker

    solo = two_face_video[0].copy()
    solo[:, 200:] = 128                   # right face not yet in scene
    tracker = MultiFaceTracker(FaceDetectionModel.FULL, max_faces=4,
                               redetect_every=2)
    r = tracker.step(solo[None])          # step 0: forced detect
    assert tracker.face_count[0] == 1
    valid0 = np.asarray(r.mesh_valid)[0]
    s1 = int(np.argmax(valid0))
    x1 = float(np.asarray(r.mesh)[0, s1, :, 0].mean())
    assert x1 < 0.5                       # the left face

    r = tracker.step(two_face_video[1][None])   # step 1: tracked only
    assert tracker.face_count[0] == 1           # entry not seen yet

    r = tracker.step(two_face_video[2][None])   # step 2: redetect
    valid = np.asarray(r.mesh_valid)[0]
    assert valid.sum() == 2
    # the tracked face kept its slot and is still the left face
    assert valid[s1]
    x1b = float(np.asarray(r.mesh)[0, s1, :, 0].mean())
    assert x1b < 0.5 and abs(x1b - x1) < 0.1
    # the entering face landed in a different (previously empty) slot
    s2 = int([i for i in range(4) if valid[i] and i != s1][0])
    x2 = float(np.asarray(r.mesh)[0, s2, :, 0].mean())
    assert x2 > 0.5
    # and tracking continues with both slots stable
    r = tracker.step(two_face_video[3][None])
    valid = np.asarray(r.mesh_valid)[0]
    assert valid[s1] and valid[s2]
    assert float(np.asarray(r.mesh)[0, s1, :, 0].mean()) < 0.5
    assert float(np.asarray(r.mesh)[0, s2, :, 0].mean()) > 0.5


@pytest.mark.slow
def test_multiface_tracker_planar_matches_hwc(two_face_video):
    """K-face tracking accepts planar frames with identical results."""
    from tpu_face.tracking import MultiFaceTracker

    t_h = MultiFaceTracker(FaceDetectionModel.FULL, max_faces=2)
    t_p = MultiFaceTracker(FaceDetectionModel.FULL, max_faces=2,
                           input_layout="planar")
    for frame in two_face_video[:2]:
        rh = t_h.step(frame[None])
        rp = t_p.step(np.ascontiguousarray(
            frame[None].transpose(0, 3, 1, 2)))
        np.testing.assert_array_equal(np.asarray(rh.mesh_valid),
                                      np.asarray(rp.mesh_valid))
        np.testing.assert_allclose(np.asarray(rh.mesh),
                                   np.asarray(rp.mesh), atol=1e-6)
    assert (t_p.face_count == t_h.face_count).all()


def test_multiface_tracker_loss_triggers_redetect(two_face_video):
    from tpu_face.tracking import MultiFaceTracker

    tracker = MultiFaceTracker(FaceDetectionModel.FULL, max_faces=4)
    tracker.step(two_face_video[0][None])
    assert tracker.face_count[0] == 2
    # blank out the right face: its slot loses presence and the repair
    # sub-batch re-detects the stream IN-step, re-locking on the
    # remaining face
    lost = two_face_video[1].copy()
    lost[:, 200:] = 0
    tracker.step(lost[None])
    assert tracker.tracking.all()
    assert tracker.face_count[0] == 1
    # the survivor keeps tracking on subsequent frames
    r = tracker.step(lost[None])
    assert tracker.tracking.all()
    assert tracker.face_count[0] == 1
    assert np.asarray(r.mesh_valid)[0].sum() == 1

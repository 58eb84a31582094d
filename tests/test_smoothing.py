"""OneEuro landmark smoothing (tpu_face.smoothing) + tracker wiring.

The filter itself is pinned against scalar-reference OneEuro dynamics
(jitter shrinks at rest, steps converge, speed raises the cutoff);
the tracker integration is pinned on semantics that matter to
consumers: raw tracking dynamics (state ROIs) unchanged, first frame
passes through raw, invalid rows untouched, state resets on
re-acquisition.  Reference library has no video mode; semantics match
the upstream MediaPipe landmarks_smoothing_calculator (OneEuro with
object-scale speed normalization).
"""

import numpy as np
import pytest

from tpu_face.smoothing import LandmarkSmoother, OneEuroConfig


def _run(smoother, frames, valid=None):
    outs = []
    for i, f in enumerate(frames):
        v = None if valid is None else valid[i]
        outs.append(np.asarray(smoother(f, v)))
    return np.stack(outs)


def _noisy_static(n=60, streams=2, pts=8, noise=0.004, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, size=(streams, pts, 3)).astype(np.float32)
    return (base[None] + rng.normal(0, noise, size=(n, streams, pts, 3))
            .astype(np.float32)), base


def test_static_jitter_shrinks():
    frames, base = _noisy_static()
    out = _run(LandmarkSmoother(), frames)
    raw_rms = np.sqrt(((frames[20:] - base) ** 2).mean())
    sm_rms = np.sqrt(((out[20:] - base) ** 2).mean())
    assert sm_rms < 0.35 * raw_rms, (raw_rms, sm_rms)


def test_first_frame_passthrough_and_motion_tracks():
    # a linearly moving point: the filter must not lag more than a few
    # frames' worth of motion (beta opens the cutoff with speed)
    n, v = 40, 0.01  # 1% of the frame per frame — fast head motion
    t = np.arange(n, dtype=np.float32)
    # spread points (realistic face extent, diag ~0.3) moving rigidly
    spread = np.array([[0.0, 0.0], [0.2, 0.0], [0.0, 0.2], [0.2, 0.2]],
                      np.float32)
    frames = np.zeros((n, 1, 4, 3), np.float32)
    frames[..., 0] = 0.2 + (v * t)[:, None, None] + spread[None, None, :, 0]
    frames[..., 1] = 0.4 + spread[None, None, :, 1]
    sm = LandmarkSmoother()
    out = _run(sm, frames)
    np.testing.assert_allclose(out[0], frames[0])  # init = raw
    lag = (frames[10:, ..., 0] - out[10:, ..., 0]) / v  # in frames
    assert np.all(lag < 4.0), lag.max()


def test_invalid_rows_pass_through_and_reset():
    frames, _ = _noisy_static(n=30, streams=2)
    valid = np.ones((30, 2), bool)
    valid[10:20, 1] = False        # stream 1 drops out mid-run
    frames[10:20, 1] += 0.5        # and its raw values jump away
    sm = LandmarkSmoother()
    out = _run(sm, frames, valid)
    # invalid rows: raw passthrough
    np.testing.assert_allclose(out[10:20, 1], frames[10:20, 1])
    # re-acquisition restarts the filter at the raw value (frame 20),
    # not dragged toward the pre-drop history
    np.testing.assert_allclose(out[20, 1], frames[20, 1])
    # the other stream keeps smoothing throughout
    d_raw = np.abs(np.diff(frames[5:30, 0, :, 0], axis=0)).mean()
    d_sm = np.abs(np.diff(out[5:30, 0, :, 0], axis=0)).mean()
    assert d_sm < 0.5 * d_raw


def test_shape_change_resets_state():
    sm = LandmarkSmoother()
    a = np.full((2, 4, 3), 0.5, np.float32)
    sm(a)
    sm(a + 0.001)
    b = np.full((3, 4, 3), 0.9, np.float32)  # new batch size
    np.testing.assert_allclose(np.asarray(sm(b)), b)  # fresh init


def test_multiface_leading_dims():
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 0.8, size=(2, 3, 6, 3)).astype(np.float32)
    frames = (base[None] + rng.normal(0, 0.003, size=(20, 2, 3, 6, 3))
              .astype(np.float32))  # [B=2, K=3] streams
    valid = np.ones((20, 2, 3), bool)
    out = _run(LandmarkSmoother(), frames, valid)
    assert out.shape == frames.shape
    d_raw = np.abs(np.diff(frames[5:], axis=0)).mean()
    d_sm = np.abs(np.diff(out[5:], axis=0)).mean()
    assert d_sm < 0.5 * d_raw


def test_result_smoother_mesh_and_iris_one_filter():
    """ResultSmoother: mesh + iris filtered as one face-scaled set —
    iris jitter shrinks by the FACE-scale cutoff (a per-iris-bbox
    normalization would barely smooth it), and invalid rows reset."""
    from tpu_face.smoothing import ResultSmoother

    rng = np.random.default_rng(3)
    mesh0 = rng.uniform(0.3, 0.7, size=(2, 40, 3)).astype(np.float32)
    iris0 = rng.uniform(0.45, 0.55, size=(2, 2, 5, 3)).astype(np.float32)
    sm = ResultSmoother()
    meshes, irises = [], []
    raw_m, raw_i = [], []
    for _ in range(40):
        m = mesh0 + rng.normal(0, 0.003, mesh0.shape).astype(np.float32)
        i = iris0 + rng.normal(0, 0.003, iris0.shape).astype(np.float32)
        raw_m.append(m), raw_i.append(i)
        om, oi = sm(m, i, np.ones(2, bool))
        meshes.append(np.asarray(om)), irises.append(np.asarray(oi))
    for raw, out in ((raw_m, meshes), (raw_i, irises)):
        d_raw = np.abs(np.diff(np.stack(raw)[10:], axis=0)).mean()
        d_sm = np.abs(np.diff(np.stack(out)[10:], axis=0)).mean()
        assert d_sm < 0.4 * d_raw, (d_raw, d_sm)
    assert meshes[0].shape == mesh0.shape
    assert irises[0].shape == iris0.shape


def test_config_validation():
    with pytest.raises(AssertionError):
        LandmarkSmoother(OneEuroConfig(min_cutoff=0.0))


def test_dropped_frame_dt_smooths_like_two_steps():
    """Real-timestamp semantics (upstream landmarks_smoothing
    integrates frame timestamps): one step with dt=2/rate must smooth
    like TWO unit steps, not like one — and must match the analytic
    one-pole update at te=2/rate exactly (beta=0 makes the cutoff
    constant, so the filter is a plain low-pass)."""
    cfg = OneEuroConfig(min_cutoff=1.0, beta=0.0, rate=30.0)
    te = 1.0 / 30.0
    x0 = np.full((1, 4, 3), 0.2, np.float32)
    x1 = np.full((1, 4, 3), 0.6, np.float32)

    def smoothed(dts):
        sm = LandmarkSmoother(cfg)
        sm(x0)  # init = raw
        out = None
        for dt in dts:
            out = np.asarray(sm(x1, dt=dt))
        return out

    two_unit = smoothed([te, te])
    dropped = smoothed([2.0 * te])
    one_unit = smoothed([te])

    # analytic: x_hat = a*x1 + (1-a)*x0 with a = 1/(1 + tau/te')
    tau = 1.0 / (2.0 * np.pi * cfg.min_cutoff)
    a2 = 1.0 / (1.0 + tau / (2.0 * te))
    np.testing.assert_allclose(
        dropped, a2 * x1 + (1.0 - a2) * x0, atol=1e-6)
    # the dropped-frame step lands near two unit steps, not one
    assert (np.abs(dropped - two_unit).max()
            < np.abs(dropped - one_unit).max()), \
        (dropped[0, 0, 0], two_unit[0, 0, 0], one_unit[0, 0, 0])


def test_dt_default_equals_config_rate():
    """dt=None is exactly dt=1/rate — the fixed-fps behavior of
    rounds 1-3 is the default, real timestamps are opt-in."""
    frames, _ = _noisy_static(n=10)
    sm_a, sm_b = LandmarkSmoother(), LandmarkSmoother()
    for f in frames:
        a = np.asarray(sm_a(f))
        b = np.asarray(sm_b(f, dt=1.0 / 30.0))
        np.testing.assert_array_equal(a, b)


def test_dt_validation():
    sm = LandmarkSmoother()
    with pytest.raises(ValueError, match="dt"):
        sm(np.zeros((1, 4, 3), np.float32), dt=0.0)
    with pytest.raises(ValueError, match="dt"):
        sm(np.zeros((1, 4, 3), np.float32), dt=-0.1)


def test_result_smoother_dt_no_retrace():
    """Variable dt rides ONE jitted program (te is a traced scalar) —
    per-frame dt changes must not recompile."""
    import jax

    from tpu_face.smoothing import ResultSmoother

    sm = ResultSmoother()
    mesh = np.full((1, 40, 3), 0.5, np.float32)
    iris = np.full((1, 2, 5, 3), 0.5, np.float32)
    sm(mesh, iris, np.ones(1, bool), dt=1 / 30)
    traced = sm._jitted
    with jax.checking_leaks():
        for dt in (1 / 30, 2 / 30, 1 / 24, None):
            sm(mesh, iris, np.ones(1, bool), dt=dt)
    assert sm._jitted is traced
    assert traced._cache_size() == 1, traced._cache_size()


def test_tracker_smoothing_wiring():
    """FaceTracker(smoothing=...): output mesh/iris smoothed, state
    ROIs identical to an unsmoothed tracker (dynamics unchanged),
    first frame raw, validity untouched."""
    import jax.numpy as jnp

    from tpu_face.tracking import FaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    rng = np.random.default_rng(0)

    def jittered():
        # small sensor-noise jitter so the raw mesh wobbles
        noise = rng.normal(0, 2.0, size=img.shape)
        return np.clip(img.astype(np.float32) + noise,
                       0, 255).astype(np.uint8)

    frames = [np.stack([jittered()]) for _ in range(8)]

    plain = FaceTracker()
    smooth = FaceTracker(smoothing="one_euro")
    raw_meshes, sm_meshes = [], []
    for f in frames:
        r = plain.step(f)
        s = smooth.step(f)
        raw_meshes.append(np.asarray(r.mesh)[0])
        sm_meshes.append(np.asarray(s.mesh)[0])
        assert np.asarray(s.mesh_valid).all()
        assert np.asarray(s.iris).shape == np.asarray(r.iris).shape
        # tracking dynamics unchanged: same state ROIs
        np.testing.assert_allclose(np.asarray(smooth._state.roi),
                                   np.asarray(plain._state.roi),
                                   atol=1e-5)
    np.testing.assert_allclose(sm_meshes[0], raw_meshes[0], atol=1e-6)
    raw_d = np.abs(np.diff(np.stack(raw_meshes)[2:], axis=0)).mean()
    sm_d = np.abs(np.diff(np.stack(sm_meshes)[2:], axis=0)).mean()
    assert sm_d < 0.7 * raw_d, (raw_d, sm_d)
    # smoothed stays within the raw jitter amplitude on a static
    # scene (the filter can only lag by what the noise moves)
    px = np.abs(np.stack(sm_meshes)[..., :2]
                - np.stack(raw_meshes)[..., :2]).max() * 540
    assert px < 3.0, px

    smooth.reset()
    assert smooth._smoother._state is None


def test_multiface_smoothing_continuous_across_redetect():
    """Forced detector passes (redetect_every) must not reset or jump
    the per-slot filters: match_slots keeps slot identities, so the
    smoothed mesh stays continuous on a static two-face scene."""
    import jax.numpy as jnp

    from tpu_face.tracking import MultiFaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    # two faces: original + mirrored, side by side
    scene = np.concatenate([img, img[:, ::-1]], axis=1)
    frames = np.stack([scene])

    tr = MultiFaceTracker(max_faces=2, redetect_every=2,
                          smoothing="one_euro")
    meshes = []
    for _ in range(6):
        res = tr.step(frames)
        v = np.asarray(res.mesh_valid)[0]
        assert v.sum() == 2, v
        meshes.append(np.asarray(res.mesh)[0])
    # static scene: successive smoothed meshes stay sub-pixel-close,
    # INCLUDING the steps where the forced detector pass ran
    w = scene.shape[1]
    for a, b in zip(meshes[1:], meshes[2:]):
        d_px = np.abs(b[..., :2] - a[..., :2]).max() * w
        assert d_px < 2.0, d_px


@pytest.mark.slow
def test_tracker_smoothing_resets_on_resolution_change():
    """Normalized landmark shapes are resolution-blind, so the
    tracker must reset the filter when its own state resets on a
    geometry change — the first post-switch output equals the raw
    mesh instead of blending toward the previous stream's history."""
    import numpy as np

    from tpu_face.tracking import FaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    small = img[:352, :528]  # different geometry, face still visible

    smooth = FaceTracker(smoothing="one_euro")
    plain = FaceTracker()
    for _ in range(3):
        smooth.step(np.stack([img]))
    s = smooth.step(np.stack([small]))
    p = plain.step(np.stack([small]))
    assert bool(np.asarray(s.mesh_valid)[0])
    np.testing.assert_allclose(np.asarray(s.mesh), np.asarray(p.mesh),
                               atol=1e-6)


def test_tracker_smoothing_rejects_bad_config():
    from tpu_face.tracking import FaceTracker

    with pytest.raises(TypeError, match="smoothing"):
        FaceTracker(smoothing=42)

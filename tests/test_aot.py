"""AOT export/load roundtrip (tpu_face.aot) vs the live programs.

The stablehlo artifact must reproduce the live jitted program exactly
(same trace, weights baked as constants), and ``attach`` must route
the ordinary host API through the loaded program.  Reference has no
AOT story (TFLite interpreters are built at runtime,
face_detection.rs:146-203) — this subsystem is TPU-native serving
infrastructure.  The stateful tracker-step roundtrip lives in the
slow lane (its program compiles all three paths).
"""

import numpy as np
import pytest

from tpu_face import aot
from tpu_face.pipeline import FaceCascade
from tpu_face.tracking import FaceTracker
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"


@pytest.fixture(scope="module")
def frames():
    img = load_image(MAN)
    return np.stack([img, img[:, ::-1]])


@pytest.fixture(scope="module")
def artifact(tmp_path_factory, frames):
    """(path, live result) — the cascade exported once per module."""
    cascade = FaceCascade()
    live = cascade(frames)
    b, h, w, _ = frames.shape
    p = aot.save(cascade, tmp_path_factory.mktemp("aot") / "cascade.aot",
                 batch=b, height=h, width=w)
    return p, live


def test_cascade_roundtrip_and_attach(artifact, frames):
    p, live = artifact
    assert p.stat().st_size > 1_000_000  # weights baked in
    _, h, w, _ = frames.shape

    fresh = FaceCascade()
    prog = aot.attach(fresh, p)
    assert prog.meta["cls"] == "FaceCascade"
    assert prog.meta["layout"] == "hwc"
    assert (h, w) in fresh._jitted
    out = fresh.infer_batch(frames)
    # identical program -> identical numerics (not just within budget)
    np.testing.assert_allclose(np.asarray(live.mesh),
                               np.asarray(out.mesh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(live.score),
                               np.asarray(out.score), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(live.mesh_valid),
                                  np.asarray(out.mesh_valid))


def test_stablehlo_artifact_is_pickle_free(artifact, tmp_path):
    """The default artifact kind must be safe to load from untrusted
    sources: a pickle-free container (magic + JSON meta + raw
    jax.export payload), and ``load`` must refuse to unpickle
    anything that isn't an executable-kind container."""
    import json
    import pickle
    import struct

    p, _ = artifact
    raw = p.read_bytes()
    assert raw.startswith(aot._MAGIC)
    (n,) = struct.unpack(">Q", raw[len(aot._MAGIC):len(aot._MAGIC) + 8])
    meta = json.loads(raw[len(aot._MAGIC) + 8:len(aot._MAGIC) + 8 + n])
    assert meta["kind"] == "stablehlo"

    evil = tmp_path / "evil.aot"
    evil.write_bytes(pickle.dumps({"meta": {"format": "x"}}))
    with pytest.raises(ValueError, match="artifact"):
        aot.load(evil)
    not_pickle = tmp_path / "junk.aot"
    not_pickle.write_bytes(b"PNG\x89 definitely not an artifact")
    with pytest.raises(ValueError, match="artifact"):
        aot.load(not_pickle)


def test_attach_rejects_mismatches(artifact):
    p, _ = artifact
    with pytest.raises(ValueError, match="FaceCascade"):
        aot.attach(FaceTracker(), p)
    with pytest.raises(ValueError, match="layout"):
        aot.attach(FaceCascade(input_layout="planar"), p)


def test_attach_pad_batch(artifact, frames):
    """pad_batch=True: a 1-frame call rides the saved batch-2 program
    (zero-padded, result sliced back), bit-identical to the live
    per-frame result; oversize batches still raise."""
    p, live = artifact
    fresh = FaceCascade()
    aot.attach(fresh, p, pad_batch=True)
    out = fresh.infer_batch(frames[:1])
    assert np.asarray(out.mesh).shape[0] == 1
    np.testing.assert_allclose(np.asarray(live.mesh)[:1],
                               np.asarray(out.mesh), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(live.mesh_valid)[:1],
                                  np.asarray(out.mesh_valid))
    # exact-size calls pass through unpadded
    full = fresh.infer_batch(frames)
    np.testing.assert_allclose(np.asarray(live.mesh),
                               np.asarray(full.mesh), atol=1e-6)
    with pytest.raises(ValueError, match="exceeds"):
        fresh.infer_batch(np.concatenate([frames, frames]))
    # trackers carry state: pad_batch must refuse
    with pytest.raises(ValueError, match="pad_batch"):
        aot.attach(FaceTracker(), p, pad_batch=True)


@pytest.mark.slow
def test_attach_pad_batch_planar(tmp_path, frames):
    """pad_batch pads axis 0 of [B, 3, H, W] planar input too."""
    planar = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))
    b, _, h, w = planar.shape
    cascade = FaceCascade(input_layout="planar")
    live = cascade(planar)
    p = aot.save(cascade, tmp_path / "planar.aot", batch=b,
                 height=h, width=w)
    fresh = FaceCascade(input_layout="planar")
    aot.attach(fresh, p, pad_batch=True)
    out = fresh.infer_batch(planar[:1])
    np.testing.assert_allclose(np.asarray(live.mesh)[:1],
                               np.asarray(out.mesh), atol=1e-6)


@pytest.mark.slow
def test_executable_kind_roundtrip(tmp_path):
    """kind="executable" (pickled PJRT binary): zero-compile load.

    Runs in a subprocess with ONE CPU device: the deserialized
    executable binds to every local device of the reloading client,
    so under this suite's forced 8-virtual-device CPU mesh a
    single-device program can't be re-executed (upstream
    serialize_executable behavior, not an artifact bug).  One device
    is the real serving configuration; the TPU backend is validated
    on-chip (0.9 s load, exact parity)."""
    import subprocess
    import sys

    script = f"""
import numpy as np
from tpu_face import aot
from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

img = load_image({MAN!r})
frames = np.stack([img, img[:, ::-1]])
b, h, w, _ = frames.shape
cascade = FaceCascade()
live = cascade(frames)
p = aot.save(cascade, {str(tmp_path)!r} + "/cascade_exec.aot",
             batch=b, height=h, width=w, kind="executable")
prog = aot.load(p)
assert prog.meta["kind"] == "executable"
out = prog(frames)
np.testing.assert_allclose(np.asarray(live.mesh),
                           np.asarray(out.mesh), atol=1e-6)
print("EXEC_ROUNDTRIP_OK")
"""
    import os
    env = {k: v for k, v in os.environ.items()
           if "AXON" not in k.upper() and not k.startswith("TPU_")}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # default: one CPU device
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert "EXEC_ROUNDTRIP_OK" in r.stdout, (r.stdout, r.stderr)


@pytest.mark.slow
def test_embed_cascade_roundtrip(tmp_path, frames):
    """EmbedCascade artifacts: detect->crop->embed program attaches
    and reproduces the live embeddings exactly (demo graph)."""
    from tpu_face.pipeline import EmbedCascade

    demo = "/root/repo/tpu_face/data/demo"
    b, h, w, _ = frames.shape
    cas = EmbedCascade(embed_model_path=demo)
    live = cas(frames)
    p = aot.save(cas, tmp_path / "embed.aot", batch=b, height=h,
                 width=w)
    fresh = EmbedCascade(embed_model_path=demo)
    prog = aot.attach(fresh, p)
    assert prog.meta["cls"] == "EmbedCascade"
    out = fresh.infer_batch(frames)
    np.testing.assert_allclose(np.asarray(live.embedding),
                               np.asarray(out.embedding), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(live.face_valid),
                                  np.asarray(out.face_valid))


@pytest.mark.slow
def test_multiface_tracker_roundtrip(tmp_path, frames):
    """MultiFaceTracker step artifacts: stateful K-face equivalence
    across a full-detect step and a tracked step."""
    from tpu_face.tracking import MultiFaceTracker

    b, h, w, _ = frames.shape
    live_tr = MultiFaceTracker(max_faces=2)
    live0 = live_tr.step(frames)
    live1 = live_tr.step(frames)

    p = aot.save(MultiFaceTracker(max_faces=2),
                 tmp_path / "mtracker.aot", batch=b, height=h, width=w)
    fresh = MultiFaceTracker(max_faces=2)
    prog = aot.attach(fresh, p)
    assert prog.meta["cls"] == "MultiFaceTracker"
    out0 = fresh.step(frames)
    out1 = fresh.step(frames)
    for a, o in ((live0, out0), (live1, out1)):
        np.testing.assert_array_equal(np.asarray(a.mesh_valid),
                                      np.asarray(o.mesh_valid))
        v = np.asarray(a.mesh_valid)
        np.testing.assert_allclose(np.asarray(a.mesh)[v],
                                   np.asarray(o.mesh)[v], atol=1e-6)
    assert np.asarray(fresh.tracking).all()


@pytest.mark.slow
def test_tracker_step_roundtrip(tmp_path, frames):
    b, h, w, _ = frames.shape
    tracker = FaceTracker()
    live0 = tracker.step(frames)
    live1 = tracker.step(frames)

    saver = FaceTracker()
    p = aot.save(saver, tmp_path / "tracker.aot", batch=b,
                 height=h, width=w)
    fresh = FaceTracker()
    aot.attach(fresh, p)
    out0 = fresh.step(frames)
    out1 = fresh.step(frames)
    # stateful equivalence across a full-detect step AND a tracked step
    for a, o in ((live0, out0), (live1, out1)):
        np.testing.assert_allclose(np.asarray(a.mesh),
                                   np.asarray(o.mesh), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a.mesh_valid),
                                      np.asarray(o.mesh_valid))
    assert np.asarray(fresh.tracking).all()

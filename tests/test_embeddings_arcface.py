"""Real-graph FaceEmbeddings coverage: an ArcFace-class (MobileFaceNet)
.tflite is generated, converted, and executed end-to-end.

The reference's embeddings model is a separately downloaded ArcFace
flatbuffer (reference face_embeddings.rs:30-44, README.md:9-10); no
download exists here, so ``tools/make_arcface_tflite.py`` exports the
same architecture class with deterministic weights.  These tests pin the
whole path the reference exercises in face_embeddings.rs:119-146:
flatbuffer -> converter -> XLA lowering (FULLY_CONNECTED / MEAN / MUL /
MINIMUM et al.) -> crop+resize pipeline -> L2-normalized vector ->
cosine similarity, with the TFLite interpreter + OpenCV as oracles.
"""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
cv2 = pytest.importorskip("cv2")

sys.path.insert(0, "/root/repo/tools")

from tpu_face.models import FaceDetection, FaceDetectionModel  # noqa: E402
from tpu_face.models import FaceEmbeddings  # noqa: E402
from tpu_face.types import BBox  # noqa: E402
from tpu_face.utils.image_io import load_image, similarity_score  # noqa: E402

RUSS_1 = "/root/reference/test_data/russ_cox_1.jpg"
RUSS_2 = "/root/reference/test_data/russ_cox_2.jpg"

_CACHE = Path("/tmp/tpu_face_fixtures")
_WIDTH = 0.5
_VER = "v1"


@pytest.fixture(scope="module")
def arcface(tmp_path_factory):
    """(tflite_path, npz_dir): generated once, cached across sessions."""
    _CACHE.mkdir(exist_ok=True)
    tfl = _CACHE / f"arcface_w{_WIDTH}_{_VER}.tflite"
    npz = _CACHE / f"arcface_w{_WIDTH}_{_VER}" / "face_embeddings.npz"
    if not tfl.exists():
        from make_arcface_tflite import export
        export(str(tfl), width=_WIDTH)
    if not npz.exists():
        from convert_tflite import convert
        npz.parent.mkdir(exist_ok=True)
        convert(str(tfl), str(npz))
    return str(tfl), str(npz.parent)


def _tflite_embed(tflite_path, tensor_112):
    interp = tf.lite.Interpreter(model_path=tflite_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"],
                      tensor_112[None].astype(np.float32))
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    flat = out.reshape(-1)
    return flat / np.linalg.norm(flat)


def _reference_crop_tensor(img, bbox):
    """The reference pipeline: int-truncated Mat::roi crop
    (face_embeddings.rs:101-109) then the whole-crop perspective warp to
    112x112 in range (0,1) (transform.rs:188-309, keep_aspect=false)."""
    x, y = int(bbox.xmin), int(bbox.ymin)
    w, h = int(bbox.xmax - bbox.xmin), int(bbox.ymax - bbox.ymin)
    crop = img[y:y + h, x:x + w].astype(np.float32)
    src = np.array([(0, 0), (w, 0), (w, h), (0, h)], np.float32)
    dst = np.array([(0, 0), (112, 0), (112, 112), (0, 112)], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    warped = cv2.warpPerspective(crop, m, (112, 112),
                                 flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT)
    return warped / 255.0


def _detect_bbox(path):
    det = FaceDetection(FaceDetectionModel.SHORT)
    faces = det.infer(path)
    assert faces, f"no face found in {path}"
    img = load_image(path)
    h, w = img.shape[:2]
    b = faces[0].bbox().scale((float(w), float(h)))
    return BBox(b.xmin, b.ymin, b.xmax, b.ymax)


def test_arcface_converted_op_set(arcface):
    """The converted graph really contains the embeddings op set."""
    import json

    _, npz_dir = arcface
    payload = np.load(Path(npz_dir) / "face_embeddings.npz",
                      allow_pickle=False)
    meta = json.loads(str(payload["__graph__"]))
    hist = {}
    for node in meta["ops"]:
        hist[node["op"]] = hist.get(node["op"], 0) + 1
    for op in ("FULLY_CONNECTED", "MEAN", "MUL", "MINIMUM", "LOGISTIC",
               "CONV_2D", "DEPTHWISE_CONV_2D", "ADD", "RELU"):
        assert hist.get(op, 0) >= 1, (op, hist)


def test_arcface_net_parity(arcface):
    """Lowered XLA graph vs the TFLite interpreter, random inputs."""
    import jax

    from tpu_face.compiler import Graph, build_jax_fn

    tfl, npz_dir = arcface
    graph = Graph(Path(npz_dir) / "face_embeddings.npz")
    fn = jax.jit(build_jax_fn(graph))

    interp = tf.lite.Interpreter(model_path=tfl)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    rng = np.random.default_rng(7)
    for _ in range(2):
        x = rng.uniform(0.0, 1.0, size=inp["shape"]).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        want = interp.get_tensor(interp.get_output_details()[0]["index"])
        got = np.asarray(fn(x)[0])
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert rel < 1e-4, rel


def test_arcface_net_batch_polymorphic(arcface):
    import jax

    from tpu_face.compiler import Graph, build_jax_fn

    _, npz_dir = arcface
    graph = Graph(Path(npz_dir) / "face_embeddings.npz")
    fn = jax.jit(build_jax_fn(graph))
    rng = np.random.default_rng(3)
    xb = rng.uniform(0.0, 1.0, size=(3, 112, 112, 3)).astype(np.float32)
    full = np.asarray(fn(xb)[0])
    assert full.shape[0] == 3
    row = np.asarray(fn(xb[1:2])[0])
    rel = np.max(np.abs(full[1] - row[0])) / (np.max(np.abs(row)) + 1e-9)
    assert rel < 1e-5, rel


def test_arcface_e2e_matches_reference_pipeline(arcface):
    """FaceEmbeddings.infer vs the transcribed reference pipeline
    (face_embeddings.rs:46-86) with OpenCV + TFLite as the oracle."""
    tfl, npz_dir = arcface
    emb = FaceEmbeddings(model_path=npz_dir)
    bbox = _detect_bbox(RUSS_1)
    ours = emb.infer(RUSS_1, bbox)
    assert abs(np.linalg.norm(ours) - 1.0) < 1e-5

    img = load_image(RUSS_1)
    want = _tflite_embed(tfl, _reference_crop_tensor(img, bbox))
    cos = float(np.dot(ours, want))
    assert cos > 0.9995, cos


def test_arcface_infer_batch_matches_single(arcface):
    """infer_batch == per-image infer, one vmapped program."""
    _, npz_dir = arcface
    emb = FaceEmbeddings(model_path=npz_dir)
    b1, b2 = _detect_bbox(RUSS_1), _detect_bbox(RUSS_2)
    img1, img2 = load_image(RUSS_1), load_image(RUSS_2)
    # same canvas size for the batch: pad img2 up to img1's extent
    h = max(img1.shape[0], img2.shape[0])
    w = max(img1.shape[1], img2.shape[1])

    def pad(im):
        out = np.zeros((h, w, 3), np.uint8)
        out[:im.shape[0], :im.shape[1]] = im
        return out

    batch = np.stack([pad(img1), pad(img2)])
    got = emb.infer_batch(batch, [b1, b2])
    assert got.shape[0] == 2
    e1 = emb.infer(pad(img1), b1)
    e2 = emb.infer(pad(img2), b2)
    # vmapped conv lowering reassociates vs the single-image program:
    # a few 1e-5 of float noise on a unit vector
    np.testing.assert_allclose(got[0], e1, atol=2e-4)
    np.testing.assert_allclose(got[1], e2, atol=2e-4)
    assert np.all(np.abs(np.linalg.norm(got, axis=1) - 1.0) < 1e-5)


def test_embed_cascade_matches_standalone(arcface):
    """The fused detect->crop->embed program (pipeline.EmbedCascade)
    reproduces the standalone FaceDetection + FaceEmbeddings chain."""
    from tpu_face.pipeline import EmbedCascade

    _, npz_dir = arcface
    cascade = EmbedCascade(FaceDetectionModel.SHORT,
                           embed_model_path=npz_dir)
    img = load_image(RUSS_1)
    res = cascade.infer_batch(img[None])
    assert bool(np.asarray(res.face_valid)[0])

    # detection agrees with the standalone detector
    bbox = _detect_bbox(RUSS_1)
    cb = np.asarray(res.crop_bbox)[0]          # (x0, y0, x1, y1) abs
    assert abs(cb[0] - int(bbox.xmin)) <= 1
    assert abs(cb[1] - int(bbox.ymin)) <= 1
    assert np.all(cb == np.trunc(cb))          # int-truncated rect

    # embedding of the SAME crop rect through the standalone model
    emb = FaceEmbeddings(model_path=npz_dir)
    want = emb.infer(RUSS_1, BBox(float(cb[0]), float(cb[1]),
                                  float(cb[2]), float(cb[3])))
    got = np.asarray(res.embedding)[0]
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-5


def test_embed_cascade_batch_and_multiface(arcface):
    """Batched frames and max_faces > 1 shapes; invalid slots are
    NaN-free (the eps-guarded L2 norm)."""
    from tpu_face.pipeline import EmbedCascade

    _, npz_dir = arcface
    cascade = EmbedCascade(FaceDetectionModel.SHORT,
                           embed_model_path=npz_dir, max_faces=2)
    img1 = load_image(RUSS_1)
    img2 = load_image(RUSS_2)
    h = max(img1.shape[0], img2.shape[0])
    w = max(img1.shape[1], img2.shape[1])

    def pad(im):
        out = np.zeros((h, w, 3), np.uint8)
        out[:im.shape[0], :im.shape[1]] = im
        return out

    res = cascade.infer_batch(np.stack([pad(img1), pad(img2)]))
    embs = np.asarray(res.embedding)           # [2, 2, D]
    valid = np.asarray(res.face_valid)         # [2, 2]
    assert embs.shape[:2] == (2, 2)
    assert valid[0, 0] and valid[1, 0]
    assert np.all(np.isfinite(embs))           # incl. invalid slots
    # same-photo crops of the two subjects embed deterministically
    n0 = np.linalg.norm(embs[0, 0])
    n1 = np.linalg.norm(embs[1, 0])
    assert abs(n0 - 1.0) < 1e-5 and abs(n1 - 1.0) < 1e-5


def test_arcface_similarity_two_subjects(arcface):
    """Same-subject pair flows end-to-end like the reference test
    (face_embeddings.rs:119-146): embed two photos, cosine-compare."""
    tfl, npz_dir = arcface
    emb = FaceEmbeddings(model_path=npz_dir)
    b1, b2 = _detect_bbox(RUSS_1), _detect_bbox(RUSS_2)
    e1 = emb.infer(RUSS_1, b1)
    e2 = emb.infer(RUSS_2, b2)
    ours = similarity_score(e1, e2)
    assert math.isfinite(ours) and -1.0 <= ours <= 1.0

    img1, img2 = load_image(RUSS_1), load_image(RUSS_2)
    w1 = _tflite_embed(tfl, _reference_crop_tensor(img1, b1))
    w2 = _tflite_embed(tfl, _reference_crop_tensor(img2, b2))
    want = float(np.dot(w1, w2))
    assert abs(ours - want) < 2e-3, (ours, want)


# The REAL ArcFace weights (the reference's separately-downloaded
# flatbuffer, face_embeddings.rs:119-146) cannot be fetched from this
# zero-egress environment (attempt log in models/face_embeddings.py).
# If a converted real model is ever dropped at either location below,
# this test runs automatically and asserts semantic same-person
# similarity; until then it self-skips.
import os  # noqa: E402

_REAL_DIRS = [Path("/root/repo/tpu_face/data/real"),
              Path(os.environ.get("TPU_FACE_ARCFACE_DIR", "/nonexistent"))]
_REAL = next((d for d in _REAL_DIRS
              if (d / "face_embeddings.npz").exists()), None)


@pytest.mark.skipif(_REAL is None, reason=(
    "real ArcFace weights absent (zero-egress env; drop a converted "
    "face_embeddings.npz in tpu_face/data/real/ or set "
    "TPU_FACE_ARCFACE_DIR to enable)"))
def test_real_arcface_same_person_similarity():
    """Reference semantic check (face_embeddings.rs:119-146): the two
    russ_cox photos are the same person, so real-weight embeddings
    must agree.  The reference test only prints the score; we assert
    the same-person bar ArcFace-class models clear comfortably."""
    emb = FaceEmbeddings(model_path=str(_REAL))
    b1, b2 = _detect_bbox(RUSS_1), _detect_bbox(RUSS_2)
    sim = similarity_score(emb.infer(RUSS_1, b1), emb.infer(RUSS_2, b2))
    assert math.isfinite(sim) and -1.0 <= sim <= 1.0
    assert sim > 0.3, f"same-person similarity {sim:.3f}"

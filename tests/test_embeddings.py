"""FaceEmbeddings: the model file isn't bundled (reference
README.md:9-10), so the pipeline is exercised with a synthetic converted
graph in the same .npz format the converter emits."""

import json

import numpy as np
import pytest

from tpu_face.models import FaceEmbeddings, FeatureCount
from tpu_face.types import BBox

MAN = "/root/reference/test_data/man.jpg"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A tiny valid embedding graph: 112x112x3 -> conv(VALID, full
    kernel) -> [1, 8] -> reshape [1, 8]."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("emb")
    tensors = [
        {"shape": [1, 112, 112, 3], "dtype": "float32"},   # t0 input
        {"shape": [8, 112, 112, 3], "dtype": "float32"},   # t1 weight OHWI
        {"shape": [8], "dtype": "float32"},                # t2 bias
        {"shape": [1, 1, 1, 8], "dtype": "float32"},       # t3 conv out
        {"shape": [1, 8], "dtype": "float32"},             # t4 output
    ]
    ops = [
        {"op": "CONV_2D", "inputs": [0, 1, 2], "outputs": [3],
         "options": {"stride": [1, 1], "dilation": [1, 1],
                     "padding": "VALID", "activation": "NONE"}},
        {"op": "RESHAPE", "inputs": [3], "outputs": [4],
         "options": {"new_shape": [1, 8]}},
    ]
    graph = {"inputs": [0], "outputs": [4], "tensors": tensors,
             "ops": ops}
    payload = {
        "__graph__": np.array(json.dumps(graph)),
        "t1": rng.normal(size=(8, 112, 112, 3)).astype(np.float32) * 0.01,
        "t2": rng.normal(size=(8,)).astype(np.float32),
    }
    np.savez_compressed(d / "face_embeddings.npz", **payload)
    return str(d)


def test_embeddings_l2_normalized(model_dir):
    emb = FaceEmbeddings(model_path=model_dir)
    out = emb.infer(MAN, BBox(195.6, 74.1, 334.9, 213.4))
    assert out.shape == (8,)
    assert abs(np.linalg.norm(out) - 1.0) < 1e-5


def test_embeddings_similarity_roundtrip(model_dir):
    from tpu_face.utils.image_io import similarity_score
    emb = FaceEmbeddings(model_path=model_dir)
    a = emb.infer(MAN, BBox(195.6, 74.1, 334.9, 213.4))
    b = emb.infer(MAN, BBox(195.6, 74.1, 334.9, 213.4))
    assert similarity_score(a, b) == pytest.approx(1.0, abs=1e-5)
    # a different crop gives a different embedding
    c = emb.infer(MAN, BBox(0.0, 0.0, 112.0, 112.0))
    assert similarity_score(a, c) < 0.999


def test_embeddings_missing_model_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="not bundled"):
        FaceEmbeddings(model_path=str(tmp_path))


def test_embeddings_empty_bbox(model_dir):
    emb = FaceEmbeddings(model_path=model_dir)
    with pytest.raises(ValueError, match="empty crop"):
        emb.infer(MAN, BBox(10.0, 10.0, 10.0, 50.0))


def test_embed_boxes_matches_infer(model_dir):
    """embed_boxes (device-resident detection boxes, traced crop)
    reproduces infer's host-path crop for the same box."""
    from tpu_face.utils.image_io import load_image

    emb = FaceEmbeddings(model_path=model_dir)
    img = load_image(MAN)
    h, w = img.shape[:2]
    # fractional coords: integer-valued ones can truncate differently
    # after the f32 normalize/denormalize round trip (the box API is
    # normalized; exact-integer edges are knife-edge by construction)
    bbox = BBox(120.3, 60.3, 320.7, 260.7)
    want = emb.infer(img, bbox)
    box = np.array([[[bbox.xmin / w, bbox.ymin / h],
                     [bbox.xmax / w, bbox.ymax / h]]], np.float32)
    got = emb.embed_boxes(img[None], box)
    assert got.shape == (1,) + want.shape
    # vmapped conv lowering reassociates vs the single-image
    # program: small float noise on a unit vector
    np.testing.assert_allclose(got[0], want, atol=2e-4)
    # face-axis variant: [B, K, 2, 2] -> [B, K, D], finite even for a
    # degenerate box (eps-guarded norm)
    boxes_k = np.concatenate([box[:, None],
                              np.zeros((1, 1, 2, 2), np.float32)],
                             axis=1)
    out = emb.embed_boxes(img[None], boxes_k)
    assert out.shape == (1, 2) + want.shape
    np.testing.assert_allclose(out[0, 0], want, atol=2e-4)
    assert np.isfinite(out).all()


def test_embed_boxes_mesh_planar_and_validation(model_dir):
    """Landmark-set input reduces to the tight bbox inside the
    program; planar frames are accepted; clear errors on shape
    mismatches."""
    from tpu_face.utils.image_io import load_image

    emb = FaceEmbeddings(model_path=model_dir)
    img = load_image(MAN)
    h, w = img.shape[:2]
    bbox = BBox(120.3, 60.3, 320.7, 260.7)
    box = np.array([[[bbox.xmin / w, bbox.ymin / h],
                     [bbox.xmax / w, bbox.ymax / h]]], np.float32)
    want = emb.embed_boxes(img[None], box)[0]

    # a landmark set whose bounds ARE that box -> same crop
    rng = np.random.default_rng(4)
    inner = rng.uniform(0.3, 0.7, size=(1, 6, 3)).astype(np.float32)
    lms = inner * np.array([[(bbox.xmax - bbox.xmin) / w,
                             (bbox.ymax - bbox.ymin) / h, 1.0]],
                           np.float32)
    lms[..., 0] += bbox.xmin / w
    lms[..., 1] += bbox.ymin / h
    lms[0, 0, :2] = (bbox.xmin / w, bbox.ymin / h)
    lms[0, 1, :2] = (bbox.xmax / w, bbox.ymax / h)
    got = emb.embed_boxes(img[None], lms)
    np.testing.assert_allclose(got[0], want, atol=2e-4)

    # planar frames produce the same embedding
    planar = np.ascontiguousarray(img[None].transpose(0, 3, 1, 2))
    got_p = emb.embed_boxes(planar, box, layout="planar")
    np.testing.assert_allclose(got_p[0], want, atol=2e-4)

    with pytest.raises(ValueError, match="box rows"):
        emb.embed_boxes(np.stack([img, img]), box)
    with pytest.raises(ValueError, match="images must be"):
        emb.embed_boxes(planar, box)     # planar without layout=


def test_feature_count_enum():
    assert FeatureCount.FEATURE_128 == 128
    assert FeatureCount.FEATURE_512 == 512

"""Planar ingestion: [B, 3, H, W] channel-plane input must reproduce
the HWC path exactly on every warp backend, and the native decoder's
planar mode must match its interleaved mode.

Planar input is a new-capability extension over the reference (whose
OpenCV boundary always yields interleaved Mats, utils.rs:8-21): the
host decoder emits channel planes for free and the device then never
pays a frame-layout transpose.
"""

import numpy as np
import pytest

from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"


def _tree_equal(a, b):
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("warp", ["gather", "pallas"])
def test_planar_cascade_matches_hwc(warp):
    img = load_image(MAN)
    hwc = img[None]
    planar = np.ascontiguousarray(hwc.transpose(0, 3, 1, 2))
    out_h = FaceCascade(warp_method=warp).infer_batch(hwc)
    out_p = FaceCascade(warp_method=warp,
                        input_layout="planar").infer_batch(planar)
    _tree_equal(out_h, out_p)
    assert bool(out_p.mesh_valid[0])


def test_planar_embed_cascade_matches_hwc():
    """EmbedCascade consumes decoder-emitted channel planes too (the
    demo embeddings graph is bundled, so no generation needed)."""
    from pathlib import Path

    import tpu_face
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import EmbedCascade

    demo = str(Path(tpu_face.__file__).parent / "data" / "demo")
    img = load_image(MAN)
    hwc = img[None]
    planar = np.ascontiguousarray(hwc.transpose(0, 3, 1, 2))
    out_h = EmbedCascade(FaceDetectionModel.SHORT,
                         embed_model_path=demo).infer_batch(hwc)
    out_p = EmbedCascade(FaceDetectionModel.SHORT, embed_model_path=demo,
                         input_layout="planar").infer_batch(planar)
    assert bool(np.asarray(out_h.face_valid)[0])
    np.testing.assert_array_equal(np.asarray(out_h.crop_bbox),
                                  np.asarray(out_p.crop_bbox))
    np.testing.assert_allclose(np.asarray(out_h.embedding),
                               np.asarray(out_p.embedding), atol=1e-5)


def test_planar_decode_matches_interleaved():
    from tpu_face.utils import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built")
    data = open(MAN, "rb").read()
    w, h = native_loader.jpeg_info(data)
    hwc = native_loader.decode_jpeg_batch([data, data], w, h)
    pla = native_loader.decode_jpeg_batch([data, data], w, h,
                                          planar=True)
    assert pla.shape == (2, 3, h, w)
    np.testing.assert_array_equal(pla, hwc.transpose(0, 3, 1, 2))

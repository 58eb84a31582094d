"""Native C++ JPEG batch loader vs Pillow."""

import numpy as np
import pytest

from tpu_face.utils import native_loader
from tpu_face.utils.image_io import load_image

MAN = "/root/reference/test_data/man.jpg"

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


def test_info():
    data = open(MAN, "rb").read()
    assert native_loader.jpeg_info(data) == (540, 360)


def test_single_decode_matches_pillow():
    data = open(MAN, "rb").read()
    ours = native_loader.decode_jpeg(data)
    pil = load_image(MAN)
    assert ours.shape == pil.shape == (360, 540, 3)
    # independent libjpeg IDCT paths may differ by a level or two
    diff = np.abs(ours.astype(np.int16) - pil.astype(np.int16))
    assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(),
                                                    diff.max())


def test_batch_decode():
    data = open(MAN, "rb").read()
    out = native_loader.decode_jpeg_batch([data] * 8, 540, 360,
                                          num_threads=4)
    assert out.shape == (8, 360, 540, 3)
    np.testing.assert_array_equal(out[0], out[7])
    assert out[0].mean() > 10  # actually decoded, not zeros


def test_batch_bad_frame_zero_filled():
    data = open(MAN, "rb").read()
    out = native_loader.decode_jpeg_batch([data, b"not a jpeg"], 540, 360)
    assert out[0].mean() > 10
    assert out[1].sum() == 0


def test_batch_wrong_size_zero_filled():
    data = open(MAN, "rb").read()
    out = native_loader.decode_jpeg_batch([data], 123, 45)
    assert out.shape == (1, 45, 123, 3)
    assert out.sum() == 0

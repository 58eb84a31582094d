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


def test_mjpeg_split_roundtrip(tmp_path):
    """Concatenated JPEGs (with EXIF-free libjpeg output) split back
    into the exact original frame byte strings."""
    if not native_loader.available():
        pytest.skip("native loader not built")
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    frames = []
    for q in (60, 85, 95):
        img = Image.fromarray(
            rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=q)
        frames.append(buf.getvalue())
    stream = b"junk" + b"".join(frames) + b"\xff"   # leading garbage
    parts = native_loader.mjpeg_split(stream)
    assert parts == frames
    out = native_loader.decode_jpeg_batch(parts, 64, 48, planar=True)
    assert out.shape == (3, 3, 48, 64)


def test_mjpeg_split_truncated_frame_resyncs_at_next_soi():
    """A truncated frame (stream cuts to the next SOI where a segment
    should start) is dropped; the following frames are kept intact.

    Without the explicit SOI-resync the walk would read the next
    frame's marker bytes as a segment LENGTH and could land on
    plausible-marker bytes deep inside it, emitting a garbage slice
    that swallows the real frame (the round-2 advisor finding)."""
    # truncated frame: SOI + one complete APP0 segment, then nothing
    bad = b"\xff\xd8" + b"\xff\xe0\x00\x04\x00\x00"
    # f2: SOI + one huge APP1 segment with FF D9 planted exactly where
    # the buggy length-jump from `bad` would land, then SOS + entropy
    # + EOI.  The correct walk skips the whole APP1 by its length.
    app1_len = 65530                       # includes the 2 length bytes
    payload = bytearray(b"\x00" * (app1_len - 2))
    # buggy walk: at p=8 reads f2's marker bytes FF E1 as a length
    # -> p = 8 + 2 + 0xFFE1 = 65515 (global); plant FF D9 there
    plant = 65515 - (8 + 2 + 2 + 2)        # offset inside the payload
    payload[plant:plant + 2] = b"\xff\xd9"
    f2 = (b"\xff\xd8" + b"\xff\xe1" + app1_len.to_bytes(2, "big")
          + bytes(payload) + b"\xff\xda\x00\x02" + b"\x11" * 100
          + b"\xff\xd9")
    f3 = b"\xff\xd8\xff\xda\x00\x02" + b"\x22" * 16 + b"\xff\xd9"
    parts = native_loader.mjpeg_split(bad + f2 + f3)
    assert parts == [f2, f3]


def test_mjpeg_split_handles_marker_bytes_in_scan():
    """0xFFD8/0xFFD9-looking bytes inside entropy-coded data must not
    split a frame (the parser walks segment structure)."""
    if not native_loader.available():
        pytest.skip("native loader not built")
    import io

    from PIL import Image

    # noisy image -> dense entropy data; verify single-frame indexing
    rng = np.random.default_rng(5)
    img = Image.fromarray(
        rng.integers(0, 255, (120, 160, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=98)
    one = buf.getvalue()
    parts = native_loader.mjpeg_split(one * 4)
    assert len(parts) == 4
    assert all(p == one for p in parts)

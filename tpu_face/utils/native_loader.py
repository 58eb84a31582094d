"""ctypes binding for the native C++ JPEG batch decoder.

Replaces the reference's OpenCV-C++ decode boundary (reference:
utils.rs:8-21) for high-throughput serving: Pillow decodes ~1 frame/ms
single-threaded, which cannot feed a 5k-frames/s chip; the native loader
(native/jpeg_loader.cc, libjpeg + std::thread pool) decodes batches into
one contiguous [N, H, W, 3] array ready for device transfer.

Falls back transparently when the shared library can't be built (no
g++/libjpeg); ``available()`` reports which path is active.
"""

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libtpuface_loader.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.tpuface_jpeg_info.restype = ctypes.c_int
    lib.tpuface_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tpuface_jpeg_decode.restype = ctypes.c_int
    lib.tpuface_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int]
    lib.tpuface_jpeg_decode_batch.restype = ctypes.c_int
    lib.tpuface_jpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_ulong),
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.tpuface_jpeg_decode_batch_planar.restype = ctypes.c_int
    lib.tpuface_jpeg_decode_batch_planar.argtypes = \
        lib.tpuface_jpeg_decode_batch.argtypes
    lib.tpuface_mjpeg_index.restype = ctypes.c_int
    lib.tpuface_mjpeg_index.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_ulong), ctypes.POINTER(ctypes.c_ulong),
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native decoder is built and loadable."""
    return _load() is not None


def jpeg_info(data: bytes):
    """(width, height) of a JPEG, or None if undecodable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.tpuface_jpeg_info(data, len(data), ctypes.byref(w),
                             ctypes.byref(h)) != 0:
        return None
    return (w.value, h.value)


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode one JPEG to an RGB [H, W, 3] uint8 array (None on
    failure or when the native library is unavailable)."""
    lib = _load()
    if lib is None:
        return None
    info = jpeg_info(data)
    if info is None:
        return None
    w, h = info
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.tpuface_jpeg_decode(data, len(data),
                                 out.ctypes.data_as(ctypes.c_void_p),
                                 w, h)
    return out if rc == 0 else None


def decode_jpeg_batch(datas: Sequence[bytes], width: int, height: int,
                      num_threads: int = 0, strict: bool = False,
                      planar: bool = False):
    """Decode same-sized JPEGs into one [N, H, W, 3] uint8 array —
    or [N, 3, H, W] channel planes with ``planar=True``, the layout
    ``FaceCascade(input_layout="planar")`` consumes so the device never
    pays a frame transpose (the C++ decoder deinterleaves per scanline
    at negligible host cost).

    Frames that fail to decode (or whose size differs from
    (width, height)) come back zero-filled; the decoder's failure count
    is surfaced so callers can tell a failed frame from a black one:
    ``strict=True`` raises on any failure, otherwise a nonzero count is
    warned once per call.  ``num_threads`` 0 = one per CPU.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable — check g++ and "
                           "libjpeg, or use image_io.load_image")
    n = len(datas)
    shape = (n, 3, height, width) if planar else (n, height, width, 3)
    out = np.zeros(shape, np.uint8)
    if n == 0:
        return out
    bufs = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_ulong * n)(*[len(d) for d in datas])
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    fn = (lib.tpuface_jpeg_decode_batch_planar if planar
          else lib.tpuface_jpeg_decode_batch)
    failures = fn(
        bufs, lens, out.ctypes.data_as(ctypes.c_void_p),
        width, height, n, num_threads)
    if failures:
        msg = (f"decode_jpeg_batch: {failures}/{n} frames failed to "
               f"decode (zero-filled)")
        if strict:
            raise ValueError(msg)
        import warnings
        warnings.warn(msg, stacklevel=2)
    return out


def load_jpeg_batch(paths: Sequence, width: int, height: int,
                    num_threads: int = 0) -> np.ndarray:
    """Read + decode a batch of same-sized JPEG files."""
    datas: List[bytes] = [Path(p).read_bytes() for p in paths]
    return decode_jpeg_batch(datas, width, height, num_threads)


def mjpeg_split(data: bytes, max_frames: Optional[int] = None
                ) -> List[bytes]:
    """Split an MJPEG byte stream (concatenated JPEGs — the usual
    IP-camera payload once multipart headers are stripped) into
    per-frame JPEG byte strings, via the native segment-structure
    parser (no false frame boundaries inside entropy-coded data).

    Feed the result to ``decode_jpeg_batch(..., planar=True)`` and
    ``FaceTracker(input_layout="planar")`` for the video path — see
    examples/track_mjpeg.py."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable — check g++ and "
                           "libjpeg")
    # start from a realistic frame-size estimate; the n == bound
    # retry below regrows for pathological tiny-frame streams
    bound = max_frames if max_frames is not None \
        else len(data) // 4096 + 16
    while True:
        offs = (ctypes.c_ulong * bound)()
        lens = (ctypes.c_ulong * bound)()
        n = lib.tpuface_mjpeg_index(data, len(data), offs, lens, bound)
        # n == bound may mean truncation (the indexer stops at max_n);
        # retry with a larger bound unless the caller capped it
        if n < bound or max_frames is not None:
            return [data[offs[i]:offs[i] + lens[i]] for i in range(n)]
        bound *= 4

#!/usr/bin/env python
"""Video tracking over an MJPEG stream, end to end on the native path:

    MJPEG bytes -> native frame indexer (mjpeg_split)
                -> native planar batch decode
                -> FaceTracker (detector only on lock loss)

Without an input file a synthetic pan (man.jpg shifted per frame) is
encoded to MJPEG first, so the example is self-contained:

    python examples/track_mjpeg.py [stream.mjpeg] [--batch 8]

Note: the first run compiles the tracker's two XLA programs (minutes
through this environment's remote compile helper; cached afterwards),
and single-frame steps are host-tunnel-latency-bound here — bench.py
--tracking measures the real per-chip rate on device-resident batches.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import io
import time


def synth_mjpeg(n_frames: int) -> bytes:
    import numpy as np
    from PIL import Image

    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    out = io.BytesIO()
    for i in range(n_frames):
        f = np.roll(np.roll(img, 3 * i, axis=1), 2 * i, axis=0)
        Image.fromarray(f).save(out, "JPEG", quality=90)
    return out.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", nargs="?", help="MJPEG file (optional)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    import numpy as np

    from tpu_face.tracking import FaceTracker
    from tpu_face.utils import native_loader

    if not native_loader.available():
        print("native loader unavailable; build with `make -C native`")
        return 1

    data = (Path(args.stream).read_bytes() if args.stream
            else synth_mjpeg(24))
    frames = native_loader.mjpeg_split(data)
    if not frames:
        print("no JPEG frames found in stream")
        return 1
    w, h = native_loader.jpeg_info(frames[0])
    print(f"{len(frames)} frames of {w}x{h}")

    tracker = FaceTracker(input_layout="planar")
    t0 = time.perf_counter()
    locked = 0
    for i in range(0, len(frames), 1):
        # one stream, frame by frame (batch>1 would be parallel
        # streams; a single video is sequential by nature).  Lock
        # state BEFORE a step says whether THIS step skips the
        # detector (post-step state describes the next one).
        locked += int(np.asarray(tracker.tracking).sum())
        batch = native_loader.decode_jpeg_batch(frames[i:i + 1], w, h,
                                                planar=True)
        res = tracker.step(batch)
    dt = time.perf_counter() - t0
    valid = np.asarray(res.mesh_valid)
    print(f"{len(frames)} frames in {dt:.2f}s "
          f"({len(frames) / dt:.1f} fps incl. decode); "
          f"tracked (detector skipped) on {locked}/{len(frames)} "
          f"frames; last mesh_valid={bool(valid[0])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

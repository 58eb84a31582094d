#!/usr/bin/env python
"""Video-identification throughput: tracked cascade + per-frame
embeddings of every stream's face box (FaceEmbeddings.embed_boxes on
the device-resident tracker output).

    python tools/tpu_track_identify_probe.py [--batch 128]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from tpu_face.models import FaceEmbeddings
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.tracking import FaceTracker

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB"), np.uint8)
    rng = np.random.default_rng(0)
    frames = [img]
    while len(frames) < B:
        f = np.roll(img, int(rng.integers(-80, 80)), axis=1)
        frames.append(np.ascontiguousarray(f))
    batch = jnp.asarray(np.stack(frames))

    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          compute_dtype=jnp.bfloat16)
    demo = Path("/root/repo/tpu_face/data/demo")
    emb = FaceEmbeddings(model_path=str(demo),
                         compute_dtype=jnp.bfloat16)

    def step():
        res = tracker.step(batch)
        return emb.embed_boxes(batch, res.detection[:, :2, :],
                               as_numpy=False)

    # warm: lock + compile both programs
    r = tracker.step(batch)
    emb.embed_boxes(batch, r.detection[:, :2, :])
    vecs = step()
    np.asarray(vecs.ravel()[0])
    assert tracker.tracking.all()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        vecs = step()
    np.asarray(vecs.ravel()[0])
    dt = time.perf_counter() - t0
    assert tracker.tracking.all()
    fps = B * args.iters / dt
    log(f"track+identify: {fps:.1f} frames/s "
        f"({dt / args.iters * 1e3:.2f} ms/step, tracked cascade + "
        f"{B} embeddings per step)")
    print("TRACK IDENTIFY OK")


if __name__ == "__main__":
    main()

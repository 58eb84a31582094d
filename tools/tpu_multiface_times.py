#!/usr/bin/env python
"""Multi-face (max_faces=K) cascade throughput on a crowded scene.

The K-face batched program (pipeline._batched_k) runs the mesh+iris
halves under nested vmaps sharing each frame's planes, so the CNNs see
an effective batch of B*K; this probe measures what that costs in
practice relative to the single-face program on the SAME frames — the
per-face marginal cost of the crowd path.  Scene: a 2x2 grid of the
man.jpg face crop (every cell holds a detectable face), detector
FULL_SPARSE with nms_top_m=2304 as in tools/tpu_smoke_multiface.py.

    python tools/tpu_multiface_times.py [--batch 32] [--iters 40]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    np.asarray(out.score.ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--grid", type=int, default=2,
                    help="NxN face-crop grid (use 3 for K=8 sweeps)")
    ap.add_argument("--k", default="1,4",
                    help="comma-separated max_faces values")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB"), np.uint8)
    crop = img[50:240, 170:360]
    ch, cw = crop.shape[:2]
    g = args.grid
    canvas = np.zeros((g * ch, g * cw, 3), np.uint8)
    for r in range(g):
        for c in range(g):
            canvas[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw] = crop

    rng = np.random.default_rng(0)
    frames = [canvas]
    while len(frames) < B:
        f = np.roll(canvas, int(rng.integers(-40, 40)), axis=1)
        if len(frames) % 3 == 1:
            f = f[:, ::-1]
        frames.append(np.ascontiguousarray(f))
    batch = jnp.asarray(np.stack(frames))

    for k in (int(v) for v in args.k.split(",")):
        c = FaceCascade(FaceDetectionModel.FULL_SPARSE, max_faces=k,
                        nms_top_m=2304, compute_dtype=jnp.bfloat16)
        out = c(batch)
        _force(out)
        valid = np.asarray(out.mesh_valid)
        env = np.asarray(out.envelope_ok)
        _force(c(batch))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = c(batch)
        _force(out)
        dt = time.perf_counter() - t0
        n_faces = valid.sum() / B
        fps = B * args.iters / dt
        log(f"max_faces={k}: {fps:7.1f} frames/s "
            f"({dt / args.iters * 1e3:6.2f} ms/step, "
            f"{dt / args.iters / B * 1e3:.3f} ms/frame) "
            f"faces/frame={n_faces:.2f} env_ok={env.mean():.2f} "
            f"faces/s={fps * n_faces:7.1f}")

    # ---- MultiFaceTracker steady state on the same streams -----------
    from tpu_face.tracking import MultiFaceTracker

    tr = MultiFaceTracker(FaceDetectionModel.FULL_SPARSE, max_faces=4,
                          compute_dtype=jnp.bfloat16)
    res = tr.step(batch)
    _force(res)
    res = tr.step(batch)
    _force(res)
    locked = np.asarray(tr.tracking)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        res = tr.step(batch)
    _force(res)
    dt = time.perf_counter() - t0
    n_faces = np.asarray(res.mesh_valid).sum() / B
    fps = B * args.iters / dt
    log(f"multiface tracked: {fps:7.1f} frames/s "
        f"({dt / args.iters * 1e3:6.2f} ms/step) "
        f"locked={locked.mean():.2f} faces/frame={n_faces:.2f} "
        f"faces/s={fps * n_faces:7.1f}")

    print("MULTIFACE TIMES OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU validation of the strip-DMA warp path: Mosaic compile, vmap
batching, accuracy vs the exact gather, and 1080p cascade throughput.

Run on real TPU hardware (the axon plugin grabs the backend):
    python tools/tpu_check_strips.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _force(out):
    """Materialize one scalar of the LAST result (in-order device
    streams => all prior iterations finished); block_until_ready can
    no-op through the tunneled backend."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # on-device slice, 4-byte fetch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/tpu_face_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.ops import image as image_ops
    from tpu_face.ops import pallas_warp
    from tpu_face.utils.image_io import load_image

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    # ---- 1. raw strip kernel at 1080p: correctness + time -------------
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 256, (1080, 1920, 3), np.uint8)
    img = jnp.asarray(frame, jnp.float32)
    roi = jnp.array([960.0, 540.0, 520.0, 520.0, 0.3], jnp.float32)
    sx, sy, _ = image_ops._source_coords(roi, (192, 192), False, False)

    t0 = time.perf_counter()
    out = jax.block_until_ready(
        jax.jit(lambda im, a, b: pallas_warp.warp_sample(im, a, b,
                                                         band=80))(
            img, sx, sy))
    log(f"strip kernel compile+run: {time.perf_counter()-t0:.1f}s")
    ref = jax.block_until_ready(image_ops.bilinear_sample(img, sx, sy))
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    log(f"strip vs gather max diff @1080p: {diff:.4f} (budget 1.0)")
    assert diff <= 1.0

    # ---- 2. vmapped cascade at 1080p (the ANY-memspace batching check)
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade

    man = load_image("/root/reference/test_data/man.jpg")
    big = np.repeat(np.repeat(man, 2, axis=0), 2, axis=1)
    canvas = np.zeros((1080, 1920, 3), np.uint8)
    canvas[180:900, 420:1500] = big
    batch = jnp.asarray(np.broadcast_to(
        canvas, (args.batch,) + canvas.shape).copy())

    results = {}
    for method in ("pallas", "gather"):
        cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                              compute_dtype=jnp.bfloat16,
                              warp_method=method)
        t0 = time.perf_counter()
        res = jax.block_until_ready(cascade(batch[:1]))
        log(f"{method} batch-1 compile+run: {time.perf_counter()-t0:.1f}s"
            f" mesh_valid={bool(np.asarray(res.mesh_valid[0]))}"
            f" env={bool(np.asarray(res.envelope_ok[0]))}")
        t0 = time.perf_counter()
        jax.block_until_ready(cascade(batch))
        log(f"{method} batch-{args.batch} compile+run: "
            f"{time.perf_counter()-t0:.1f}s")
        for _ in range(2):
            _force(cascade(batch))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = cascade(batch)
        _force(out)
        dt = time.perf_counter() - t0
        fps = args.batch * args.iters / dt
        log(f"{method} 1080p: {fps:.1f} frames/s "
            f"({dt/args.iters*1e3:.2f} ms/step)")
        results[method] = (fps, np.asarray(out.mesh[0]),
                           np.asarray(out.iris[0]))

    mesh_px = np.abs((results["pallas"][1] - results["gather"][1])
                     * np.array([1920.0, 1080.0, 1920.0]))
    iris_px = np.abs((results["pallas"][2] - results["gather"][2])
                     * np.array([1920.0, 1080.0, 1920.0]))
    log(f"pallas vs gather on-chip: mesh {mesh_px.max():.3f} px, "
        f"iris {iris_px.max():.3f} px")
    log(f"speedup pallas/gather @1080p: "
        f"{results['pallas'][0]/results['gather'][0]:.2f}x")
    print("OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Standalone-model throughput: FaceLandmark.infer_batch with the
per-call (rt, band) warp dispatch vs the exact gather.

    python tools/tpu_standalone_times.py [--batch 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.models import FaceLandmark
    from tpu_face.types import Rect
    from tpu_face.utils.image_io import load_image

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    img = load_image("/root/reference/test_data/man.jpg")
    # device-resident batch: infer_batch's jnp.asarray is a no-op on
    # device arrays, so the loop times compute, not the host tunnel
    # (~75 MB/step at ~30 MB/s would otherwise dominate)
    imgs = jnp.asarray(
        np.stack([np.roll(img, 5 * i, axis=1) for i in range(B)]))
    jax.block_until_ready(imgs)
    rois = [Rect(0.49 + 0.005 * (i % 3), 0.40, 0.387, 0.581, -0.0267,
                 normalized=True) for i in range(B)]

    outs = {}
    for warp in ("pallas", "gather"):
        m = FaceLandmark(warp_method=warp,
                         compute_dtype=jnp.bfloat16)
        lmk, score = m.infer_batch(imgs, rois)      # compile
        t0 = time.perf_counter()
        for _ in range(20):
            lmk, score = m.infer_batch(imgs, rois)
        dt = time.perf_counter() - t0
        outs[warp] = lmk
        log(f"{warp:<7} {B * 20 / dt:8.1f} meshes/s "
            f"({dt / 20 * 1e3:6.2f} ms/step)")
    d = np.abs(outs["pallas"] - outs["gather"]).max(axis=(0, 1))
    log(f"pallas vs gather max diff (norm units): {d}")
    print("STANDALONE TIMES OK")


if __name__ == "__main__":
    main()

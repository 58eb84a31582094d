#!/usr/bin/env python
"""Stage-isolation timings for the fused cascade on real TPU.

Times (a) each CNN alone on device-resident tensors — the XLA floor —
and (b) cumulative pipeline prefixes (detect / +mesh / full), whose
differences attribute the step time to stages without trace parsing.

    python tools/tpu_stage_times.py [--batch 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    """Materialize one scalar of the LAST result: device streams run
    in order, so this proves every enqueued iteration finished.
    (block_until_ready has been observed to no-op through the tunneled
    backend, silently timing dispatch instead of compute.)"""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # on-device slice, 4-byte fetch


def bench(fn, *args, iters=10, warmup=2):
    _force(fn(*args))
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.compiler import Graph, build_jax_fn
    from tpu_face.models.face_detection import (_DATA_DIR, _MODEL_FILES,
                                                FaceDetectionModel)
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    # ---- (a) CNN-only floors -------------------------------------------
    rng = np.random.default_rng(0)
    for name, shape in [("face_detection_back", (B, 256, 256, 3)),
                        ("face_landmark", (B, 192, 192, 3)),
                        ("iris_landmark", (2 * B, 64, 64, 3))]:
        g = Graph(_DATA_DIR / f"{name}.npz")
        fn = jax.jit(build_jax_fn(g, compute_dtype=jnp.bfloat16))
        x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        ms = bench(fn, x)
        log(f"net {name:28s} {str(shape):20s} {ms:7.2f} ms")

    # ---- (b) cumulative pipeline prefixes ------------------------------
    img = load_image("/root/reference/test_data/man.jpg")
    batch = jnp.asarray(
        np.broadcast_to(img, (B,) + img.shape).copy())
    cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                          compute_dtype=jnp.bfloat16)

    from functools import partial

    from tpu_face.ops import image as image_ops
    from tpu_face.ops import postprocess as post

    w, h = 540, 360

    def detect_only(image):
        imgf = image.astype(jnp.float32)
        whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
        tensor, padding = image_ops.warp_image_to_tensor(
            imgf, whole, (cascade.det_w, cascade.det_h),
            keep_aspect_ratio=True, output_range=(-1.0, 1.0),
            method="separable")
        raw_boxes, raw_scores = cascade._det_net(tensor[None])
        boxes = post.decode_boxes(raw_boxes[0], cascade.anchors,
                                  float(cascade.det_h))
        scores = post.clamped_sigmoid(raw_scores[0].reshape(-1))
        valid = post.detection_validity(boxes, scores)
        out_d, out_s, out_v = post.weighted_nms(boxes, scores, valid,
                                                max_outputs=1)
        return post.letterbox_removal(out_d, padding), out_s, out_v

    def detect_nonms(image):
        imgf = image.astype(jnp.float32)
        whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
        tensor, padding = image_ops.warp_image_to_tensor(
            imgf, whole, (cascade.det_w, cascade.det_h),
            keep_aspect_ratio=True, output_range=(-1.0, 1.0),
            method="separable")
        raw_boxes, raw_scores = cascade._det_net(tensor[None])
        return raw_boxes, raw_scores

    t_nonms = bench(jax.jit(jax.vmap(detect_nonms)), batch)
    t_det = bench(jax.jit(jax.vmap(detect_only)), batch)
    t_full = bench(cascade, batch)
    log(f"pipeline warp+detnet (no nms) {t_nonms:7.2f} ms")
    log(f"pipeline detect (incl. nms)   {t_det:7.2f} ms")
    log(f"pipeline full cascade         {t_full:7.2f} ms")
    log(f"  -> decode+nms+letterbox     {t_det - t_nonms:7.2f} ms")
    log(f"  -> mesh+iris stages         {t_full - t_det:7.2f} ms")
    print("STAGE TIMES OK")


if __name__ == "__main__":
    main()

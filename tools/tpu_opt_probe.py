#!/usr/bin/env python
"""Optimization probes for the two big non-CNN costs (batch 256):

1. mesh Pallas warp: sensitivity to band (MXU dot K-dim is XWIN, but
   band scales both the dot M-dim and the wy build);
2. whole-image separable detection warp: where its ~8 ms goes
   (cast / dots / epilogue), f32 vs bf16-dot variants.

    python tools/tpu_opt_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_face_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpu_face.ops import image as image_ops
from tpu_face.ops.pallas_warp import make_planes, warp_sample_multi

B = 256
log = lambda m: print(m, file=sys.stderr, flush=True)


def _force(out):
    """Materialize one scalar of the LAST result (in-order device
    streams => all prior iterations finished); block_until_ready can
    no-op through the tunneled backend."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # on-device slice, 4-byte fetch


def bench(f, *args, iters=20):
    _force(f(*args))
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, 360, 540, 3)
                                    ).astype(np.uint8))
    rois = jnp.asarray(np.stack(
        [np.array([265 + i % 7, 144 + i % 5, 209.0, 209.0,
                   0.03 * (i % 3 - 1)], np.float32)
         for i in range(B)]))

    # ---- 1. mesh warp band sweep ---------------------------------------
    for band in (32, 48, 64):
        planes_fn = jax.jit(jax.vmap(
            lambda im: make_planes(im, band=band)))
        planes = jax.block_until_ready(planes_fn(imgs))

        def mesh_warp(pl_, roi, _band=band):
            mx, my, _ = image_ops._source_coords(roi, (192, 192),
                                                 False, False)
            (out,) = warp_sample_multi(None, [(mx, my)], band=_band,
                                       planes=pl_)
            return out

        t = bench(jax.jit(jax.vmap(mesh_warp)), planes, rois)
        log(f"mesh warp band={band:3d}: {t:7.2f} ms")

    # ---- 2. iris warp --------------------------------------------------
    eye_l = jnp.asarray(np.stack(
        [np.array([234.0, 110, 57, 57, 0.03], np.float32)] * B))
    eye_r = jnp.asarray(np.stack(
        [np.array([290.0, 109, 57, 57, -0.1], np.float32)] * B))
    planes = jax.block_until_ready(jax.jit(jax.vmap(
        lambda im: make_planes(im, band=48)))(imgs))

    def iris_warp(pl_, rl, rr):
        lx, ly, _ = image_ops._source_coords(rl, (64, 64), True, False)
        rx, ry, _ = image_ops._source_coords(rr, (64, 64), True, True)
        return warp_sample_multi(None, [(lx, ly), (rx, ry)], band=48,
                                 planes=pl_)

    t = bench(jax.jit(jax.vmap(iris_warp)), planes, eye_l, eye_r)
    log(f"iris warp 2x64 band=48: {t:7.2f} ms")

    # ---- 3. separable detection warp breakdown -------------------------
    w, h = 540, 360

    def det_warp(image, dot_dtype=None):
        imgf = image.astype(jnp.float32)
        whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
        tensor, _ = image_ops.warp_image_to_tensor(
            imgf, whole, (256, 256), keep_aspect_ratio=True,
            output_range=(-1.0, 1.0), method="separable",
            dot_dtype=dot_dtype)
        return tensor

    t32 = bench(jax.jit(jax.vmap(lambda im: det_warp(im))), imgs)
    tbf = bench(jax.jit(jax.vmap(
        lambda im: det_warp(im, jnp.bfloat16))), imgs)
    log(f"detection separable warp f32 : {t32:7.2f} ms")
    log(f"detection separable warp bf16: {tbf:7.2f} ms")

    # no-epilogue variant (is rint/scale the cost?)
    def det_warp_raw(image):
        imgf = image.astype(jnp.float32)
        whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
        sx, sy, _ = image_ops._source_coords(whole, (256, 256), True,
                                             False)
        return image_ops.separable_sample(imgf, sx, sy)

    t_raw = bench(jax.jit(jax.vmap(det_warp_raw)), imgs)
    log(f"detection separable no-epilogue: {t_raw:7.2f} ms")
    print("OPT PROBE OK")


if __name__ == "__main__":
    main()

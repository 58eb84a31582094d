#!/usr/bin/env python
"""Warp-kernel stage microbench: planes build / mesh warp / iris warp
at cascade geometry, batch 256.  Decides where the non-CNN ~11 ms of
the step actually goes (hat build vs roll vs MXU dots vs planes).

    python tools/tpu_warp_times.py [--batch 256]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    """Materialize one scalar of the LAST result (in-order device
    streams => all prior iterations finished); block_until_ready can
    no-op through the tunneled backend."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # on-device slice, 4-byte fetch


def bench(fn, *args, iters=20):
    _force(fn(*args))
    _force(fn(*args))
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

    from tpu_face.ops import image as image_ops
    from tpu_face.ops.pallas_warp import make_planes, warp_sample_multi

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, 360, 540, 3)
                                    ).astype(np.uint8))
    # cascade-typical ROIs (face ~209 px, slight rotation)
    rois = jnp.asarray(
        np.stack([np.array([265 + i % 7, 144 + i % 5, 209.0, 209.0,
                            0.03 * (i % 3 - 1)], np.float32)
                  for i in range(B)]))
    eye_l = jnp.asarray(
        np.stack([np.array([234 + i % 5, 110, 57.0, 57.0, 0.03],
                           np.float32) for i in range(B)]))
    eye_r = jnp.asarray(
        np.stack([np.array([290 - i % 5, 109, 57.0, 57.0, -0.1],
                           np.float32) for i in range(B)]))

    planes_fn = jax.jit(jax.vmap(lambda im: make_planes(im, band=64)))
    log(f"planes build (f32 pad x3)    {bench(planes_fn, imgs):7.2f} ms")
    planes = jax.block_until_ready(planes_fn(imgs))

    def mesh_warp(pl_, roi):
        mx, my, _ = image_ops._source_coords(roi, (192, 192), False,
                                             False)
        (out,) = warp_sample_multi(None, [(mx, my)], band=64,
                                   planes=pl_)
        return out

    def iris_warp(pl_, rl, rr):
        lx, ly, _ = image_ops._source_coords(rl, (64, 64), True, False)
        rx, ry, _ = image_ops._source_coords(rr, (64, 64), True, True)
        lt, rt = warp_sample_multi(None, [(lx, ly), (rx, ry)], band=48,
                                   planes=pl_)
        return lt, rt

    t_mesh = bench(jax.jit(jax.vmap(mesh_warp)), planes, rois)
    t_iris = bench(jax.jit(jax.vmap(iris_warp)), planes, eye_l, eye_r)
    log(f"mesh warp 192x192 (band 64)  {t_mesh:7.2f} ms")
    log(f"iris warp 2x64x64 (band 48)  {t_iris:7.2f} ms")
    print("WARP TIMES OK")


if __name__ == "__main__":
    main()

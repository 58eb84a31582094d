#!/usr/bin/env python
"""Row-tile probe: 8 vs 16 output rows per warp block.

Taller blocks halve the per-block strip reads (the measured kernel
floor) at the price of a taller band and a tighter rotation envelope.

    python tools/tpu_rt16_probe.py [--batch 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


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
    ap.add_argument("--batch", type=int, default=128)
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

    planes_fn = jax.jit(jax.vmap(lambda im: make_planes(im, band=128)))
    planes = jax.block_until_ready(planes_fn(imgs))

    def mesh_warp(rt, band):
        def f(pl_, roi):
            mx, my, _ = image_ops._source_coords(roi, (192, 192),
                                                 False, False)
            (out,) = warp_sample_multi(None, [(mx, my)], band=band,
                                       planes=pl_, rt=rt)
            return out
        return jax.jit(jax.vmap(f))

    def iris_warp(rt, band):
        def f(pl_, rl, rr):
            lx, ly, _ = image_ops._source_coords(rl, (64, 64), True,
                                                 False)
            rx, ry, _ = image_ops._source_coords(rr, (64, 64), True,
                                                 True)
            lt, rt_ = warp_sample_multi(None, [(lx, ly), (rx, ry)],
                                        band=band, planes=pl_, rt=rt)
            return lt, rt_
        return jax.jit(jax.vmap(f))

    outs = {}
    for rt, mb, ib in ((8, 64, 48), (32, 128, 112), (32, 128, 96),
                       (32, 96, 80)):
        try:
            tm = bench(mesh_warp(rt, mb), planes, rois)
            ti = bench(iris_warp(rt, ib), planes, eye_l, eye_r)
            outs[(rt, mb)] = np.asarray(mesh_warp(rt, mb)(planes, rois))
            log(f"rt={rt:<2} mesh(band {mb:3d}) {tm:6.2f} ms   "
                f"iris(band {ib:2d}) {ti:6.2f} ms")
        except Exception as e:
            log(f"rt={rt} band={mb}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
    ks = list(outs)
    for k in ks[1:]:
        log(f"|{ks[0]} - {k}| max: "
            f"{np.abs(outs[ks[0]] - outs[k]).max()}")
    print("RT PROBE OK")


if __name__ == "__main__":
    main()

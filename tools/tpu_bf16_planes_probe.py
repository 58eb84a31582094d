#!/usr/bin/env python
"""A/B probe: f32 planes + rolled window vs bf16 planes + wide window
(ops/pallas_warp.py).  bf16 planes halve the kernel's strip traffic —
the measured cost floor — but force the roll-free wide mode.

    python tools/tpu_bf16_planes_probe.py [--batch 128]
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

    outs = {}
    for name, dtype in (("f32 ", jnp.float32), ("bf16", jnp.bfloat16)):
        pf = jax.jit(jax.vmap(lambda im: make_planes(im, band=64,
                                                     dtype=dtype)))
        tp = bench(pf, imgs)
        planes = jax.block_until_ready(pf(imgs))
        tm = bench(jax.jit(jax.vmap(mesh_warp)), planes, rois)
        ti = bench(jax.jit(jax.vmap(iris_warp)), planes, eye_l, eye_r)
        outs[name] = np.asarray(
            jax.jit(jax.vmap(mesh_warp))(planes, rois))
        log(f"{name} planes: build {tp:6.2f}  mesh {tm:6.2f}  "
            f"iris {ti:6.2f}  (sum {tp + tm + ti:6.2f} ms)")
    diff = np.abs(outs["f32 "] - outs["bf16"]).max()
    log(f"mesh |f32 - bf16 planes| max: {diff}")
    print("BF16 PLANES PROBE OK")


if __name__ == "__main__":
    main()

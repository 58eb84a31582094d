#!/usr/bin/env python
"""Scaling probe for the warp-kernel floor and the planes build.

Varies one axis at a time on the mesh warp (cw, dot dtype, band) to
attribute the per-block cost, and A/Bs planes-build formulations
against the ~0.53 ms physics bound at batch 128.

    python tools/tpu_scaling_probe.py [--batch 128]
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
    imgs_u8 = rng.integers(0, 255, (B, 360, 540, 3)).astype(np.uint8)
    imgs = jnp.asarray(imgs_u8)
    rois = jnp.asarray(
        np.stack([np.array([265 + i % 7, 144 + i % 5, 209.0, 209.0,
                            0.03 * (i % 3 - 1)], np.float32)
                  for i in range(B)]))

    planes_fn = jax.jit(jax.vmap(lambda im: make_planes(im, band=64)))
    planes = jax.block_until_ready(planes_fn(imgs))

    def mesh_warp(cw, dot_dtype, band):
        def f(pl_, roi):
            mx, my, _ = image_ops._source_coords(roi, (192, 192), False,
                                                 False)
            (out,) = warp_sample_multi(None, [(mx, my)], band=band,
                                       planes=pl_, cw=cw,
                                       dot_dtype=dot_dtype)
            return out
        return jax.jit(jax.vmap(f))

    base = bench(mesh_warp(32, jnp.bfloat16, 64), planes, rois)
    log(f"mesh cw=32 bf16 band=64 (base) {base:7.2f} ms")
    for label, cw, dd, band in (
            ("cw=64", 64, jnp.bfloat16, 64),
            ("cw=16", 16, jnp.bfloat16, 64),
            ("f32 dots", 32, None, 64),
            ("band=32", 32, jnp.bfloat16, 32),
    ):
        t = bench(mesh_warp(cw, dd, band), planes, rois)
        log(f"mesh {label:<22} {t:7.2f} ms ({t / base:4.2f}x)")

    # sanity: cw=64 output must match cw=32 (geometry is in-envelope)
    o32 = np.asarray(mesh_warp(32, jnp.bfloat16, 64)(planes, rois))
    o64 = np.asarray(mesh_warp(64, jnp.bfloat16, 64)(planes, rois))
    log(f"|cw64 - cw32| max: {np.abs(o64 - o32).max()}")

    # ---- planes build formulations --------------------------------
    def planes_now(im):
        return make_planes(im, band=64)

    def planes_f32_first(im):
        img = im.astype(jnp.float32)
        return [jnp.pad(img[..., c], ((0, 8), (0, 100)))
                for c in range(3)]

    def planes_transpose_f32(im):
        img = im.astype(jnp.float32).transpose(2, 0, 1)
        return list(jnp.pad(img, ((0, 0), (0, 8), (0, 100))))

    def planes_pad_then_t(im):
        img = jnp.pad(im.astype(jnp.float32),
                      ((0, 8), (0, 100), (0, 0)))
        return list(img.transpose(2, 0, 1))

    for label, fn in (("current (u8 slice+pad)", planes_now),
                      ("f32 cast then slice", planes_f32_first),
                      ("f32 cast, 3d transpose", planes_transpose_f32),
                      ("pad f32 then transpose", planes_pad_then_t)):
        t = bench(jax.jit(jax.vmap(fn)), imgs)
        log(f"planes {label:<24} {t:7.2f} ms")
    print("SCALING PROBE OK")


if __name__ == "__main__":
    main()

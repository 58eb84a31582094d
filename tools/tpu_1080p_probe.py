#!/usr/bin/env python
"""Large-frame (1080p) warp path probe: f32 HBM strip-DMA (round-2
default) vs bf16 planes, which fit the VMEM residency budget at 1080p
(12.53 MB) and halve strip-DMA traffic when forced to strips mode.

    python tools/tpu_1080p_probe.py [--batch 32]
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
    ap.add_argument("--batch", type=int, default=32)
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

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)
                                    ).astype(np.uint8))
    # 1080p-scale face (roi ~627 px -> mesh scale 3.27) + eyes
    rois = jnp.asarray(
        np.stack([np.array([960 + i % 7, 540 + i % 5, 627.0, 627.0,
                            0.03 * (i % 3 - 1)], np.float32)
                  for i in range(B)]))
    eye_l = jnp.asarray(
        np.stack([np.array([840 + i % 5, 430, 170.0, 170.0, 0.03],
                           np.float32) for i in range(B)]))
    eye_r = jnp.asarray(
        np.stack([np.array([1080 - i % 5, 428, 170.0, 170.0, -0.1],
                           np.float32) for i in range(B)]))
    MB, IB = 128, 128     # pipeline._bands(1920x1080) = (128, 128)

    def stack_planes(lst):
        return jnp.stack(lst)  # force strips layout

    def mesh_warp(pl_, roi):
        mx, my, _ = image_ops._source_coords(roi, (192, 192), False,
                                             False)
        (out,) = warp_sample_multi(None, [(mx, my)], band=MB,
                                   planes=pl_)
        return out

    def iris_warp(pl_, rl, rr):
        lx, ly, _ = image_ops._source_coords(rl, (64, 64), True, False)
        rx, ry, _ = image_ops._source_coords(rr, (64, 64), True, True)
        lt, rt = warp_sample_multi(None, [(lx, ly), (rx, ry)], band=IB,
                                   planes=pl_)
        return lt, rt

    outs = {}
    cases = [("f32 strips ", jnp.float32, True),
             ("bf16 strips", jnp.bfloat16, True),
             ("bf16 reside", jnp.bfloat16, False)]
    for name, dtype, force_strips in cases:
        def pf_one(im, dtype=dtype, force=force_strips):
            p = make_planes(im, band=MB, dtype=dtype)
            if force and isinstance(p, list):
                p = jnp.stack(p)
            return p
        try:
            pf = jax.jit(jax.vmap(pf_one))
            tp = bench(pf, imgs)
            planes = jax.block_until_ready(pf(imgs))
            res = not (hasattr(planes, "ndim") and planes.ndim == 4)
            tm = bench(jax.jit(jax.vmap(mesh_warp)), planes, rois)
            ti = bench(jax.jit(jax.vmap(iris_warp)), planes, eye_l,
                       eye_r)
            outs[name] = np.asarray(
                jax.jit(jax.vmap(mesh_warp))(planes, rois))
            log(f"{name}: build {tp:6.2f}  mesh {tm:6.2f}  "
                f"iris {ti:6.2f}  (sum {tp + tm + ti:6.2f} ms)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    ks = list(outs)
    for a in ks[1:]:
        log(f"mesh |{ks[0]} - {a}| max: "
            f"{np.abs(outs[ks[0]] - outs[a]).max()}")
    print("1080P PROBE OK")


if __name__ == "__main__":
    main()

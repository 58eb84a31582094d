#!/usr/bin/env python
"""Detection-warp variants at 1080p: separable hat matmuls (current)
vs a 2x box-reduce pyramid vs a 2-tap row-gather hybrid.

The detection warp resamples the whole frame to the detector's square
input.  The hat-matmul formulation does W (resp. H) MACs per output
pixel where exact bilinear needs 2 — the question is whether the MXU's
efficiency on dense matmuls still beats sparse alternatives at 1080p:

  a) separable  wy [256,1088] @ plane [1088,2048] @ wx.T   (current)
  b) pyramid    2x2 box-reduce then (a) at half resolution
                (approximate: pooling pre-filters the bilinear taps)
  c) rowgather  y via jnp.take of 2 tap rows + blend (exact),
                x via the hat matmul (dense dim already reduced)

    python tools/tpu_det_warp_probe.py [--batch 64]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from tpu_face.ops import image as image_ops
    from tpu_face.ops.pallas_warp import make_planes

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB").resize((1920, 1080),
                                            Image.BILINEAR), np.uint8)
    rng = np.random.default_rng(0)
    frames = np.stack(
        [np.roll(img, int(rng.integers(-200, 200)), axis=1)
         for _ in range(B)])
    planar = jnp.asarray(
        np.ascontiguousarray(frames.transpose(0, 3, 1, 2)))

    w, h, det = 1920, 1080, 256
    whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
    dx, dy, _ = image_ops._source_coords(whole, (det, det), True, False)

    def prep(fr):  # [3, H, W] uint8 -> bf16 stacked planes
        return make_planes(fr, band=48, dtype=jnp.bfloat16,
                           layout="planar")

    def v_sep(fr):
        planes = prep(fr)
        return image_ops._normalize_pixels(
            image_ops.separable_sample_planar(planes, dx, dy,
                                              dot_dtype=jnp.bfloat16),
            (-1.0, 1.0), True)

    def v_pyr(fr):
        planes = prep(fr)
        hp, wp = planes.shape[1:]
        pooled = planes.reshape(3, hp // 2, 2, wp // 2, 2)
        pooled = ((pooled[:, :, 0, :, 0] + pooled[:, :, 0, :, 1]
                   + pooled[:, :, 1, :, 0] + pooled[:, :, 1, :, 1])
                  * jnp.bfloat16(0.25))
        # pooled pixel i is centered at source 2i + 0.5
        px = (dx - 0.5) * 0.5
        py = (dy - 0.5) * 0.5
        return image_ops._normalize_pixels(
            image_ops.separable_sample_planar(
                [pooled[c] for c in range(3)], px, py,
                dot_dtype=jnp.bfloat16),
            (-1.0, 1.0), True)

    def v_rowgather(fr):
        planes = prep(fr)
        hp = planes.shape[1]
        ys = dy[:, 0]                      # [256]
        y0 = jnp.floor(ys)
        fy = ys - y0
        # zero-border via tap-validity masks (the plane may have no
        # zero-pad rows when h is already tile-aligned)
        m0 = ((y0 >= 0) & (y0 <= hp - 1)).astype(jnp.float32)
        m1 = ((y0 + 1 >= 0) & (y0 + 1 <= hp - 1)).astype(jnp.float32)
        w0 = ((1.0 - fy) * m0).astype(jnp.bfloat16)[None, :, None]
        w1 = (fy * m1).astype(jnp.bfloat16)[None, :, None]
        i0 = jnp.clip(y0.astype(jnp.int32), 0, hp - 1)
        i1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 1)
        r0 = jnp.take(planes, i0, axis=1)  # [3, 256, Wp]
        r1 = jnp.take(planes, i1, axis=1)
        t1 = r0 * w0 + r1 * w1             # [3, 256, Wp] bf16
        xs = dx[0]                         # [256]
        wp = planes.shape[2]
        wx = image_ops._hat(
            jnp.arange(wp, dtype=jnp.float32)[None, :]
            - xs[:, None]).astype(jnp.bfloat16)    # [256, Wp]
        out = jnp.einsum("chw,ow->hoc", t1, wx,
                         preferred_element_type=jnp.float32)
        return image_ops._normalize_pixels(out, (-1.0, 1.0), True)

    fns = {"separable": v_sep, "pyramid": v_pyr,
           "rowgather": v_rowgather}
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(jax.vmap(fn))
        out = jf(planar)
        np.asarray(out.ravel()[0])
        o0 = np.asarray(out[0], np.float32)
        if ref is None:
            ref = o0
            diff = 0.0
        else:
            diff = float(np.abs(o0 - ref).max()) * 127.5  # uint8 levels
        np.asarray(jf(planar).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(planar)
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        us = dt / args.iters / B * 1e6
        log(f"{name:10s}: {us:8.1f} us/frame  "
            f"max|diff| vs separable = {diff:.2f} uint8 levels")
    print("DET WARP PROBE OK")


if __name__ == "__main__":
    main()

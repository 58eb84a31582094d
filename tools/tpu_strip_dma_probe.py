#!/usr/bin/env python
"""Strip-DMA granularity A/B: 3 per-channel copies vs ONE fused copy.

The HBM strips kernel (ops/pallas_warp._warp_kernel_strips) originally
issued three [band, xload] channel copies per output block.  The same
bytes move as ONE strided [3, band, xload] copy from the stacked
[3, Hp, Wp] planes — fewer DMA issues, one semaphore wait per block.

Measured on v5e (batch 64, 1080p bf16 strips config: wide window,
xload 256, rt 16, band 144, mesh-sized [192, 192] rotated ROIs):

    3-copies (split)    :   7.230 ms/call (  8852 warps/s)
    fused 1-copy        :   6.614 ms/call (  9676 warps/s)   -8.5%

bit-exact, so the fused copy IS now the library kernel; this probe
keeps the old per-channel variant inline as the reproducible baseline.

    python tools/tpu_strip_dma_probe.py [--batch 64]
"""

import argparse
import sys
import time
from functools import partial

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from PIL import Image

    from tpu_face.ops import image as image_ops
    from tpu_face.ops.pallas_warp import (_blocked, _block_dot,
                                          _block_geometry,
                                          _block_weights,
                                          _warp_kernel_strips,
                                          make_planes, plane_y_align)

    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); "
        f"batch={args.batch}")

    # ---- the OLD split-copy kernel (pre-round-3 library behavior) -----
    def _kernel_split(planes_ref, xs_ref, ys_ref, out_ref, strip_ref,
                      sem_ref, *, band, dot_bf16, plane_ratio, wide,
                      xload):
        h = planes_ref.shape[2]
        w = planes_ref.shape[3]
        cb_count = xs_ref.shape[2]
        pb = xs_ref.shape[4]
        b = pl.program_id(0) // plane_ratio
        y_align = plane_y_align(planes_ref.dtype)
        assert wide  # bf16 planes / wide window (the 1080p config)

        iota_x = jax.lax.broadcasted_iota(
            jnp.int32, (xload, pb), 0).astype(jnp.float32)
        iota_y = jax.lax.broadcasted_iota(
            jnp.int32, (band, pb), 0).astype(jnp.float32)

        geom = []
        for cb in range(cb_count):
            geom.append(_block_geometry(
                xs_ref[0, 0, cb], ys_ref[0, 0, cb], h, w, band,
                y_align, xload))

        def _dma(cb, slot, c):
            ystart, xa, _, _ = geom[cb]
            return pltpu.make_async_copy(
                planes_ref.at[b, c, pl.ds(ystart, band),
                              pl.ds(xa, xload)],
                strip_ref.at[slot, c],
                sem_ref.at[slot, c])

        for c in range(3):
            _dma(0, 0, c).start()
        for cb in range(cb_count):
            slot = cb % 2
            if cb + 1 < cb_count:
                for c in range(3):
                    _dma(cb + 1, (cb + 1) % 2, c).start()
            xs = xs_ref[0, 0, cb]
            ys = ys_ref[0, 0, cb]
            ystart, xa, off, xmin = geom[cb]
            wx, wy = _block_weights(xs, ys, xa, ystart, iota_x, iota_y,
                                    w, dot_bf16)
            for c in range(3):
                _dma(cb, slot, c).wait()
                out_ref[0, 0, c, cb, :] = _block_dot(
                    strip_ref[slot, c], wx, wy, dot_bf16)

    def build_call(kernel, band, xload, plane_dtype, gc, t, cb, pb,
                   split_sem):
        coord_spec = pl.BlockSpec((1, 1, cb, 1, pb),
                                  lambda g, i: (g, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        sem = (pltpu.SemaphoreType.DMA((2, 3)) if split_sem
               else pltpu.SemaphoreType.DMA((2,)))
        return pl.pallas_call(
            partial(kernel, band=band, dot_bf16=True, plane_ratio=1,
                    wide=True, xload=xload),
            grid=(gc, t),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), coord_spec,
                      coord_spec],
            out_specs=pl.BlockSpec((1, 1, 3, cb, pb),
                                   lambda g, i: (g, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gc, t, 3, cb, pb),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 3, band, xload),
                                       plane_dtype), sem],
        )

    # ---- workload: 1080p frames, rotated mesh-sized ROIs --------------
    B = args.batch
    CW, RT, BAND, XLOADW = 32, 16, 144, 256
    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB").resize((1920, 1080),
                                            Image.BILINEAR), np.uint8)
    rng = np.random.default_rng(0)
    planes_b = jax.vmap(lambda f: make_planes(
        f, band=BAND, dtype=jnp.bfloat16))(
        jnp.asarray(np.stack([np.roll(img, int(rng.integers(-99, 99)),
                                      axis=1) for _ in range(B)])))
    rois = np.stack([
        np.array([960 + rng.integers(-200, 200),
                  540 + rng.integers(-100, 100),
                  rng.integers(350, 640), rng.integers(350, 640),
                  rng.uniform(-0.3, 0.3)], np.float32)
        for _ in range(B)])

    xs_l, ys_l = [], []
    for i in range(B):
        sx, sy, _ = image_ops._source_coords(
            jnp.asarray(rois[i]), (192, 192), False, False)
        xs_l.append(_blocked(sx, 192, 192, CW, RT))
        ys_l.append(_blocked(sy, 192, 192, CW, RT))
    xs = jnp.stack(xs_l)
    ys = jnp.stack(ys_l)
    gc, t, cb, _, pb = xs.shape

    call_split = build_call(_kernel_split, BAND, XLOADW,
                            jnp.bfloat16, gc, t, cb, pb, True)
    call_fused = build_call(_warp_kernel_strips, BAND, XLOADW,
                            jnp.bfloat16, gc, t, cb, pb, False)
    run_split = jax.jit(lambda p, x, y: call_split(p, x, y))
    run_fused = jax.jit(lambda p, x, y: call_fused(p, x, y))

    out_a = run_split(planes_b, xs, ys)
    out_b = run_fused(planes_b, xs, ys)
    same = bool(jnp.all(out_a == out_b))
    log(f"bit-exact: {same}")
    assert same, "fused-copy kernel diverges from the per-channel one"

    results = []
    for label, fn in (("3-copies (old)", run_split),
                      ("fused 1-copy (lib)", run_fused)):
        out = fn(planes_b, xs, ys)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(planes_b, xs, ys)
        np.asarray(out.ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        log(f"{label:20s}: {dt * 1e3:7.3f} ms/call "
            f"({B / dt:8.1f} warps/s)")
        results.append((label, dt * 1e3))
    print("STRIP DMA PROBE OK", results)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Plane-build formulations: is the 1.2 ms/step pad+convert stage
(docs/PERF.md trace row "planes build", 2.8x its traffic bound at
batch 128 / 540p) paying for the HWC->planar deinterleave, and does a
different XLA formulation lower faster?

The resident-tier build (ops/pallas_warp.make_planes, hwc layout) is
three per-channel slice+convert+pads producing a LIST of [Hp, Wp] f32
planes (the kernel wants separate 2D refs).  Alternatives measured
here, all producing bit-identical outputs:

  f1 slice3   — current: [pad(img[..., c].astype(f32)) for c in 0..2]
  f2 stack    — pad(img.astype(f32).transpose(2, 0, 1)) then 3 slices
  f3 pad_last — pad HWC first, transpose after, then 3 slices
  f4 u8_first — transpose uint8, pad uint8, convert last, 3 slices

Isolation is representative for THIS stage (unlike fused CNN stages):
the planes feed an opaque pallas_call boundary, so they materialize
either way.  Timed with forced materialization at batch 128.

    python tools/tpu_planes_probe.py [--batch 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.utils.image_io import load_image

    h, w = 360, 540
    hp, wp = 360, 640            # make_planes geometry at 540p f32
    img = load_image("/root/reference/test_data/man.jpg")
    batch = jnp.asarray(np.broadcast_to(img, (B, h, w, 3)).copy())
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    def f1(im):                                 # current
        return [jnp.pad(im[..., c].astype(jnp.float32),
                        ((0, hp - h), (0, wp - w))) for c in range(3)]

    def f2(im):
        s = jnp.pad(im.astype(jnp.float32).transpose(2, 0, 1),
                    ((0, 0), (0, hp - h), (0, wp - w)))
        return [s[c] for c in range(3)]

    def f3(im):
        s = jnp.pad(im.astype(jnp.float32),
                    ((0, hp - h), (0, wp - w), (0, 0))).transpose(
                        2, 0, 1)
        return [s[c] for c in range(3)]

    def f4(im):
        s = jnp.pad(im.transpose(2, 0, 1),
                    ((0, 0), (0, hp - h), (0, wp - w))).astype(
                        jnp.float32)
        return [s[c] for c in range(3)]

    fns = {"f1 slice3  ": f1, "f2 stack   ": f2,
           "f3 pad_last": f3, "f4 u8_first": f4}
    ref = None
    for name, f in fns.items():
        jf = jax.jit(jax.vmap(f))
        out = jf(batch)
        np.asarray(out[0].ravel()[0])
        got = [np.asarray(o[0]) for o in out]
        if ref is None:
            ref = got
        else:
            for a, b in zip(ref, got):
                assert np.array_equal(a, b), f"{name} differs"
        best = None
        for _ in range(2):                      # keep second loop
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jf(batch)
            np.asarray(out[0].ravel()[0])
            best = (time.perf_counter() - t0) / args.iters
        log(f"{name}: {best * 1e3:7.3f} ms/step "
            f"({best / B * 1e6:6.2f} us/frame)")
    print("PLANES PROBE OK")


if __name__ == "__main__":
    main()

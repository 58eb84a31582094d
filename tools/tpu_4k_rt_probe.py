#!/usr/bin/env python
"""4K (3840x2160) cascade row-tile sweep for the wide-window tier.

The >2560 px tier uses cw=16 with a 512-lane wide load; round 3 moved
the <=2560 strips tier to rt=16 but left this tier at rt=8 pending its
own numbers.  Covering a rot-0 full-height 4K face (ROI 1.5 x 2160 =
3240 px) needs band >= rt*3240/192 + 17 (bf16 16-row slack), so rt=16
pairs with band 288; a tighter 224 band trades envelope for traffic.

    python tools/tpu_4k_rt_probe.py [--batch 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    np.asarray(out.score.ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from tpu_face.pipeline import FaceCascade

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB").resize((3840, 2160),
                                            Image.BILINEAR), np.uint8)
    rng = np.random.default_rng(0)
    frames = [img]
    while len(frames) < B:
        f = np.roll(img, int(rng.integers(-300, 300)), axis=1)
        frames.append(np.ascontiguousarray(f))
    batch = jnp.asarray(np.ascontiguousarray(
        np.stack(frames).transpose(0, 3, 1, 2)))

    sx, sy = 3840.0 / 540.0, 2160.0 / 360.0
    gt_nose = (263.85 * sx, 143.37 * sy)

    # (label, rt, mesh_band, iris_band)
    # Coverage algebra vs the rt8/b192 baseline over FRAME-BOUNDED
    # content (mesh ROI side <= 1.5*2160 px, s <= 16.9):
    # y16 = y8 + rt_delta*dydv <= 192 + 8*16.9*cos <= 327 -> mesh band
    # 336 (16-aligned) covers everything rt8/192 covers; 288 covers
    # the rot-0 full-height face but trims tilted close-ups beyond
    # ~0 deg (rt8/192 holds them to ~11 deg); 224 trims further.
    CONFIGS = [
        ("rt8/b192  (current)", 8, 192, 192),
        ("rt16/b336 (parity)", 16, 336, 224),
        ("rt16/b288", 16, 288, 192),
        ("rt16/b224", 16, 224, 160),
    ]

    base_warp_cfg = FaceCascade._warp_cfg
    base_bands = FaceCascade._bands
    try:
        for label, rt, mband, iband in CONFIGS:
            def warp_cfg(size, _rt=rt):
                from tpu_face.ops.pallas_warp import padded_width
                xload = min(512, padded_width(size[0]))
                return 16, xload, xload - 129, _rt

            FaceCascade._warp_cfg = staticmethod(warp_cfg)
            FaceCascade._bands = staticmethod(
                lambda s, _m=mband, _i=iband: (_m, _i))
            c = FaceCascade(compute_dtype=jnp.bfloat16,
                            input_layout="planar")
            out = c(batch)
            _force(out)
            mesh = np.asarray(out.mesh_raw[0])
            nose = (mesh[1, 0] * 3840, mesh[1, 1] * 2160)
            env = np.asarray(out.envelope_ok).mean()
            acc = (abs(nose[0] - gt_nose[0]) <= 2 * sx
                   and abs(nose[1] - gt_nose[1]) <= 2 * sy)
            _force(c(batch))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = c(batch)
            _force(out)
            dt = time.perf_counter() - t0
            log(f"{label:20s}: {B * args.iters / dt:7.1f} fps "
                f"({dt / args.iters * 1e3:6.2f} ms/step) acc={acc} "
                f"env_ok={env:.2f} nose=({nose[0]:.0f},{nose[1]:.0f})")
    finally:
        # _warp_cfg is an instance method post-round-3 (plain
        # function assignment rebinds it); _bands stays static
        FaceCascade._warp_cfg = base_warp_cfg
        FaceCascade._bands = staticmethod(base_bands)
    print("4K RT PROBE OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""1080p cascade warp-config sweep: row-tile (rt) x band x detection
pyramid.

The >=720p cascade runs the mesh/iris warps in HBM strip-DMA mode,
where per-warp traffic = blocks x [band, 256] strips.  Larger row
tiles cut the block count faster than the band grows (the VERDICT r2
"1080p headroom" item), and a 2x box-reduce before the detection
warp's hat matmuls quarters that matmul's FLOPs.  This probe measures
the full planar 1080p cascade per config and checks the accuracy gate
(man.jpg scaled to 1080p must keep nose/iris within budget of the
scaled ground truth).

    python tools/tpu_1080p_rt_probe.py [--batch 64]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
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
                     .convert("RGB").resize((1920, 1080),
                                            Image.BILINEAR), np.uint8)
    rng = np.random.default_rng(0)
    frames = [img]
    while len(frames) < B:
        f = np.roll(img, int(rng.integers(-180, 180)), axis=1)
        if len(frames) % 3 == 1:
            f = f[:, ::-1]
        frames.append(np.ascontiguousarray(f))
    hwc = np.stack(frames)
    batch = jnp.asarray(np.ascontiguousarray(hwc.transpose(0, 3, 1, 2)))

    # ground truth on the 2x-scaled man.jpg (frame 0): 540->1920 is
    # x3.5556, 360->1080 x3
    sx, sy = 1920.0 / 540.0, 1080.0 / 360.0
    gt_nose = (263.85 * sx, 143.37 * sy)
    gt_iris = (236.17 * sx, 108.88 * sy)

    # (label, rt, mesh_band, iris_band)
    CONFIGS = [
        ("rt8/b128  (current)", 8, 128, 128),
        ("rt16/b128", 16, 128, 128),
        ("rt16/b160", 16, 160, 160),
        ("rt32/b160", 32, 160, 96),
        ("rt32/b192", 32, 192, 128),
    ]

    base_warp_cfg = FaceCascade._warp_cfg   # plain function in py3
    base_bands = FaceCascade._bands
    results = []
    try:
        for label, rt, mband, iband in CONFIGS:
            FaceCascade._warp_cfg = staticmethod(
                lambda s, _rt=rt: (32, 256, 126, _rt))
            FaceCascade._bands = staticmethod(
                lambda s, _m=mband, _i=iband: (_m, _i))
            c = FaceCascade(compute_dtype=jnp.bfloat16,
                            input_layout="planar")
            out = c(batch)
            _force(out)
            mesh = np.asarray(out.mesh_raw[0])
            nose = (mesh[1, 0] * 1920, mesh[1, 1] * 1080)
            iris = np.asarray(out.iris[0])
            li = (iris[0, 0, 0] * 1920, iris[0, 0, 1] * 1080)
            env = np.asarray(out.envelope_ok).mean()
            acc = (abs(nose[0] - gt_nose[0]) <= 2 * sx
                   and abs(nose[1] - gt_nose[1]) <= 2 * sy
                   and abs(li[0] - gt_iris[0]) <= 2 * sx
                   and abs(li[1] - gt_iris[1]) <= 2 * sy)
            _force(c(batch))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = c(batch)
            _force(out)
            dt = time.perf_counter() - t0
            fps = B * args.iters / dt
            log(f"{label:20s}: {fps:7.1f} fps ({dt / args.iters * 1e3:6.2f}"
                f" ms/step) acc={acc} env_ok={env:.2f} "
                f"nose=({nose[0]:.1f},{nose[1]:.1f})")
            results.append((label, fps, acc, env))
    finally:
        # _warp_cfg is an instance method post-round-3 (plain
        # function assignment rebinds it); _bands stays static
        FaceCascade._warp_cfg = base_warp_cfg
        FaceCascade._bands = staticmethod(base_bands)
    print("1080P RT PROBE OK", results)


if __name__ == "__main__":
    main()

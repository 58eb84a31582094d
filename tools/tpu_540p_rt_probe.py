#!/usr/bin/env python
"""540p (VMEM-resident) cascade row-tile sweep.

Resident mode has no strip DMA, but each block still reads a
[band, 128] window out of the resident planes and pays per-block fixed
cost; the round-2 isolated probe saw taller tiles win with modest
bands (tools/tpu_rt16_probe.py).  This sweeps the FULL cascade at the
canonical 540x360 batch-128 configuration with envelope-equivalent and
tighter bands.

    python tools/tpu_540p_rt_probe.py [--batch 128]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=40)
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
                     .convert("RGB"), np.uint8)
    rng = np.random.default_rng(0)
    frames = [img]
    while len(frames) < B:
        f = np.roll(img, int(rng.integers(-80, 80)), axis=1)
        if len(frames) % 3 == 1:
            f = f[:, ::-1]
        frames.append(np.ascontiguousarray(f))
    batch = jnp.asarray(np.stack(frames))

    gt_nose = (263.85, 143.37)

    # (label, rt, mesh_band, iris_band)
    CONFIGS = [
        ("rt8/b64/48 (current)", 8, 64, 48),
        ("rt16/b96/72", 16, 96, 72),
        ("rt16/b64/48", 16, 64, 48),
        ("rt32/b96/72", 32, 96, 72),
        # envelope SUPERSETS of rt8/b64/48 at every rotation:
        ("rt32/b136/104", 32, 136, 104),
        ("rt32/b128/96", 32, 128, 96),
    ]

    base_warp_cfg = FaceCascade._warp_cfg
    base_bands = FaceCascade._bands
    try:
        for label, rt, mband, iband in CONFIGS:
            FaceCascade._warp_cfg = staticmethod(
                lambda s, _rt=rt: (32, 256, 126, _rt))
            FaceCascade._bands = staticmethod(
                lambda s, _m=mband, _i=iband: (_m, _i))
            c = FaceCascade(compute_dtype=jnp.bfloat16)
            out = c(batch)
            _force(out)
            mesh = np.asarray(out.mesh_raw[0])
            nose = (mesh[1, 0] * 540, mesh[1, 1] * 360)
            env = np.asarray(out.envelope_ok).mean()
            acc = (abs(nose[0] - gt_nose[0]) <= 1.0
                   and abs(nose[1] - gt_nose[1]) <= 1.0)
            _force(c(batch))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = c(batch)
            _force(out)
            dt = time.perf_counter() - t0
            log(f"{label:22s}: {B * args.iters / dt:7.1f} fps "
                f"({dt / args.iters * 1e3:6.2f} ms/step) acc={acc} "
                f"env_ok={env:.2f}")
    finally:
        # _warp_cfg is an instance method post-round-3 (plain
        # function assignment rebinds it); _bands stays static
        FaceCascade._warp_cfg = base_warp_cfg
        FaceCascade._bands = staticmethod(base_bands)
    print("540P RT PROBE OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""1080p fused-cascade throughput: hwc vs planar ingestion.

    python tools/tpu_1080p_cascade.py [--batch 32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    leaf = out.score
    np.asarray(leaf.ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
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

    for layout in ("hwc", "planar"):
        batch = (hwc if layout == "hwc"
                 else np.ascontiguousarray(hwc.transpose(0, 3, 1, 2)))
        batch = jnp.asarray(batch)
        c = FaceCascade(compute_dtype=jnp.bfloat16, input_layout=layout)
        out = c(batch)
        _force(out)
        ok = bool(np.asarray(out.mesh_valid[0]))
        _force(c(batch))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = c(batch)
        _force(out)
        dt = time.perf_counter() - t0
        log(f"{layout:<6}: {B * args.iters / dt:7.1f} frames/s "
            f"({dt / args.iters * 1e3:6.2f} ms/step) "
            f"mesh_valid[0]={ok}")
    print("1080P CASCADE OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end serving loop: native C++ JPEG batch decode -> fused
cascade on TPU, with decode overlapped against device compute via
double buffering.  Prints sustained frames/s including host decode and
host->device transfer.

Note on this dev environment: the TPU is reached through a network
tunnel, so the [B, H, W, 3] uint8 transfer (~580 KB/frame) caps
sustained throughput far below the chip's compute rate (bench.py
measures the chip rate with a device-resident batch).  On production
hosts with local PCIe (16-32 GB/s) the transfer sustains >25k frames/s
and the decode pool is the component to scale.

    python examples/serve_throughput.py [--batch 256] [--steps 10]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils import native_loader

    data = Path("/root/reference/test_data/man.jpg").read_bytes()
    w, h = native_loader.jpeg_info(data) if native_loader.available() \
        else (540, 360)
    print(f"frames: {w}x{h}, batch {args.batch}, "
          f"native decoder: {native_loader.available()}")

    # planar ingestion when the native decoder is available: it emits
    # [B, 3, H, W] channel planes directly, so the device never pays a
    # frame-layout transpose (input_layout="planar")
    planar = native_loader.available()
    cascade = FaceCascade(compute_dtype=jnp.bfloat16,
                          input_layout="planar" if planar else "hwc")

    def decode():
        if planar:
            return native_loader.decode_jpeg_batch(
                [data] * args.batch, w, h, planar=True)
        from tpu_face.utils.image_io import load_image
        img = load_image(data)
        return np.broadcast_to(img, (args.batch,) + img.shape)

    # warmup/compile
    batch = decode()
    result = cascade.infer_batch(batch)
    jax.block_until_ready(result)

    t0 = time.perf_counter()
    pending = None
    for _ in range(args.steps):
        batch = decode()                  # host decodes while the
        if pending is not None:           # previous device step runs
            jax.block_until_ready(pending)
        pending = cascade.infer_batch(batch)
    jax.block_until_ready(pending)
    dt = time.perf_counter() - t0
    fps = args.batch * args.steps / dt
    print(f"sustained (decode + cascade): {fps:.0f} frames/s "
          f"({dt / args.steps * 1e3:.1f} ms/step)")
    print(f"faces valid: {int(np.asarray(pending.face_valid).sum())}"
          f"/{args.batch}")


if __name__ == "__main__":
    main()

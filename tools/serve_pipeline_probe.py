#!/usr/bin/env python
"""Ingest->infer measured as ONE pipeline: native JPEG decode feeding
the fused cascade, with the decode overlapped against device compute
(the examples/serve_throughput.py pattern, hardened into a recorded
measurement for docs/SERVING.md).

Components are measured separately first — host decode rate, host->
device transfer rate, device-resident cascade rate — then the
overlapped loop, so the end-to-end number comes labeled with WHICH
component binds it.  On this dev box (nproc=1, tunneled TPU) the
expectation is decode- or transfer-bound; on a real PCIe serving host
the decode pool is the component to scale (docs/PERF.md headroom #2).

Timing discipline per docs/PERF.md: scalar materialization to close
every device window, first-loop discard, >=20-iteration amortization.

    python tools/serve_pipeline_probe.py [--batch 128] [--steps 12]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils import native_loader

    assert native_loader.available(), "native decoder not built " \
        "(make -C native)"

    # distinct JPEG payloads (re-encoded rolls of man.jpg) so the
    # decoder does real per-frame work, not a warm single-image path
    import cv2
    bgr = cv2.imread("/root/reference/test_data/man.jpg")
    h, w = bgr.shape[:2]
    payloads = []
    for i in range(8):
        f = np.roll(bgr, i * h // 8, axis=0)
        payloads.append(cv2.imencode(".jpg", f)[1].tobytes())
    jpegs = [payloads[i % len(payloads)] for i in range(B)]
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}, "
        f"{w}x{h} JPEG x{len(payloads)} distinct payloads")

    def decode():
        return native_loader.decode_jpeg_batch(jpegs, w, h, planar=True)

    # 1) host decode alone (this box: nproc=1, so the std::thread pool
    #    measures flat — per-core rate; a serving host scales it)
    decode()                                   # warm the pool
    rates = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            decode()
        rates.append(3 * B / (time.perf_counter() - t0))
    decode_fps = rates[-1]
    log(f"decode alone: {decode_fps:.0f} frames/s "
        f"({1e3 * B / decode_fps:.1f} ms/batch)")

    # 2) host->device transfer alone (the tunnel on this box; PCIe on
    #    a real host)
    host_batch = decode()
    nbytes = host_batch.nbytes
    dput = None
    for _ in range(2):                         # first transfer warms
        dput = jax.device_put(host_batch)
        np.asarray(dput.ravel()[0])
    rates = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            dput = jax.device_put(host_batch)
            np.asarray(dput.ravel()[0])
        rates.append(3 * B / (time.perf_counter() - t0))
    h2d_fps = rates[-1]
    log(f"host->device alone: {h2d_fps:.0f} frames/s "
        f"({nbytes / 1e6:.1f} MB/batch -> "
        f"{h2d_fps * nbytes / B / 1e6:.0f} MB/s)")

    # 3) device-resident cascade alone (bench.py's number, re-measured
    #    here so all rows share one session)
    cascade = FaceCascade(compute_dtype=jnp.bfloat16,
                          input_layout="planar")
    dev_batch = jax.device_put(host_batch)
    r = cascade(dev_batch)
    np.asarray(r.score.ravel()[0])
    assert bool(np.asarray(r.mesh_valid[0])), "face lost"
    rates = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            r = cascade(dev_batch)
        np.asarray(r.score.ravel()[0])
        rates.append(10 * B / (time.perf_counter() - t0))
    chip_fps = rates[-1]
    log(f"cascade alone (device-resident): {chip_fps:.0f} frames/s")

    # 4) the overlapped pipeline: decode batch k+1 while the device
    #    runs batch k (double buffering)
    def pipeline(steps):
        t0 = time.perf_counter()
        pending = None
        for _ in range(steps):
            nxt = decode()
            if pending is not None:
                np.asarray(pending.score.ravel()[0])   # close step k
            pending = cascade(jax.device_put(nxt))
        np.asarray(pending.score.ravel()[0])
        return steps * B / (time.perf_counter() - t0)

    pipeline(2)                                # warm the overlap path
    e2e = [pipeline(args.steps) for _ in range(2)][-1]
    binds = min(("decode", decode_fps), ("transfer", h2d_fps),
                ("chip", chip_fps), key=lambda kv: kv[1])
    log(f"end-to-end overlapped: {e2e:.0f} frames/s "
        f"(bound by {binds[0]} at {binds[1]:.0f})")
    print(f"SERVE PIPELINE decode={decode_fps:.0f} h2d={h2d_fps:.0f} "
          f"chip={chip_fps:.0f} e2e={e2e:.0f} bound={binds[0]}")


if __name__ == "__main__":
    main()

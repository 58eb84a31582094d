#!/usr/bin/env python
"""Probe XLA TPU compiler flags on the canonical cascade.

XLA_FLAGS has never been tuned in this repo (grep: only the CPU
device-count flag for tests).  The one flag with a track record for
single-chip inference is `--xla_tpu_scoped_vmem_limit_kib` — it bounds
the VMEM the fusion pass may assign to one fusion's scratch; raising
it lets XLA form deeper fusions (fewer HBM round-trips) at the risk of
spilling.  The cascade is traffic-bound in its largest stage (back CNN
at ~87% of its fused-traffic floor, docs/PERF.md), so deeper fusions
are exactly the lever that could still pay.

Because flags are parsed at backend init, each setting runs in a
FRESH subprocess, with a per-flag compilation-cache dir (debug flags
are not guaranteed to be part of the persistent-cache key).

    python tools/tpu_xla_flags_probe.py [--batch 128] [--iters 40]
"""

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import _distinct_batch
from tpu_face.models.face_detection import FaceDetectionModel
from tpu_face.pipeline import FaceCascade
from tpu_face.utils.image_io import load_image

batch_n, iters, windows = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
img = load_image("/root/reference/test_data/man.jpg")
frames = _distinct_batch(img, batch_n, np.random.default_rng(0))
cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                      compute_dtype=jnp.bfloat16,
                      warp_profile="auto")
batch = jnp.asarray(frames)
t0 = time.perf_counter()
out = cascade(batch)
np.asarray(out.score.ravel()[0])
compile_s = time.perf_counter() - t0
for _ in range(3):
    out = cascade(batch)
np.asarray(out.score.ravel()[0])
fps = []
for _ in range(windows):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cascade(batch)
    np.asarray(out.score.ravel()[0])
    fps.append(batch_n * iters / (time.perf_counter() - t0))
med = float(np.median(fps))
spr = (max(fps) - min(fps)) / med * 100.0
print(json.dumps({"fps": round(med, 1), "spread_pct": round(spr, 1),
                  "compile_s": round(compile_s, 1),
                  "windows": [round(f, 1) for f in fps]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--flags", default=None,
                    help="comma-separated flag sets to try instead of "
                         "the built-in ladder; 'none' = baseline")
    args = ap.parse_args()

    if args.flags:
        sets = [None if s == "none" else s for s in args.flags.split(",")]
    else:
        sets = [
            None,                                       # baseline
            "--xla_tpu_scoped_vmem_limit_kib=32768",
            "--xla_tpu_scoped_vmem_limit_kib=65536",
        ]
    log = lambda m: print(m, file=sys.stderr, flush=True)
    results = []
    for fl in sets:
        tag = fl or "baseline"
        cache = f"/tmp/tpu_face_flags_cache/{abs(hash(tag)) % 10**8}"
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        if fl:
            env["XLA_FLAGS"] = (base + " " + fl).strip()
        log(f"--- {tag}")
        p = subprocess.run(
            [sys.executable, "-c", CHILD, cache, str(args.batch),
             str(args.iters), str(args.windows)],
            env=env, capture_output=True, text=True, timeout=3600)
        if p.returncode != 0:
            log(p.stderr[-2000:])
            results.append({"flags": tag, "error": True})
            continue
        row = json.loads(p.stdout.strip().splitlines()[-1])
        row["flags"] = tag
        log(f"    {row}")
        results.append(row)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

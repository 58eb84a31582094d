#!/usr/bin/env python
"""Device-trace breakdown of one cascade step, grouped by stage scope.

Captures a perfetto trace of one batch-256 step and aggregates device
events by the tpu_face.* named_scope prefixes baked into pipeline.py
(utils/profiling.py), so the per-stage attribution is measured, not
inferred.

    python tools/tpu_trace_breakdown.py [--batch 256]
"""

import argparse
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCOPES = ("tpu_face.detect", "tpu_face.nms", "tpu_face.mesh_warp",
          "tpu_face.mesh", "tpu_face.iris_warp", "tpu_face.iris")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--logdir", default="/tmp/tpu_face_trace")
    ap.add_argument("--max-faces", type=int, default=1)
    ap.add_argument("--crowd", action="store_true",
                    help="2x2 face-crop grid canvas + FULL_SPARSE "
                         "(the tools/tpu_multiface_times.py scene)")
    ap.add_argument("--profile", default="coverage",
                    choices=["coverage", "auto", "speed"],
                    help="warp profile; coverage (default) keeps "
                         "stage scopes out of cond buckets")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    img = load_image("/root/reference/test_data/man.jpg")
    if args.crowd:
        crop = img[50:240, 170:360]
        ch, cw = crop.shape[:2]
        img = np.zeros((2 * ch, 2 * cw, 3), np.uint8)
        for r in range(2):
            for c in range(2):
                img[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw] = crop
    batch = jnp.asarray(np.broadcast_to(img, (B,) + img.shape).copy())
    # default "coverage": the auto profile's rt-dispatch conditionals
    # swallow the mesh/iris stage scopes into opaque `cond` buckets
    # (branch bodies attribute to the cond op) — single-branch
    # coverage keeps per-stage attribution clean; pass --profile auto
    # to trace the shipping configuration instead
    cascade = FaceCascade(
        FaceDetectionModel.FULL_SPARSE if args.crowd
        else FaceDetectionModel.BACK_CAMERA,
        max_faces=args.max_faces,
        nms_top_m=2304 if args.crowd else 128,
        warp_profile=args.profile,
        compute_dtype=jnp.bfloat16)
    jax.block_until_ready(cascade(batch))
    jax.block_until_ready(cascade(batch))

    with jax.profiler.trace(args.logdir, create_perfetto_trace=True):
        for _ in range(3):
            out = cascade(batch)
        jax.block_until_ready(out)

    time.sleep(1)
    paths = sorted(glob.glob(
        f"{args.logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        log("no perfetto trace found")
        sys.exit(1)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device threads only (TensorFlow Op / XLA Ops tracks)
    pid_names = {}
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = \
                    ev["args"].get("name", "")

    totals = {}
    grand = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Op" not in tname and "TensorFlow Op" not in tname:
            continue
        name = ev.get("name", "")
        args_ = ev.get("args", {}) or {}
        scope_src = " ".join([name, str(args_.get("tf_op", "")),
                              str(args_.get("long_name", ""))])
        dur = ev["dur"]
        grand += dur
        for s in SCOPES:
            if s in scope_src:
                totals[s] = totals.get(s, 0.0) + dur
                break
        else:
            key = name.split(".")[0].split("(")[0][:40]
            totals.setdefault("other:" + key, 0.0)
            totals["other:" + key] += dur

    log(f"trace: {paths[-1]}")
    log(f"total device op time: {grand/1e3/3:.2f} ms/step (3 steps)")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        log(f"  {k:45s} {v/1e3/3:8.2f} ms/step")
    print("TRACE OK")


if __name__ == "__main__":
    main()

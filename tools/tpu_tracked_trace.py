#!/usr/bin/env python
"""Device-trace breakdown of the TRACKED step: auto vs coverage.

Same mixed-content batch the bench uses; both profiles traced in one
process (same session), so the per-scope deltas are directly
comparable.  Device events are grouped by the tpu_face.* named_scope
prefixes; everything else (incl. conditional-boundary copies) shows up
under its HLO op name — the point of this tool is to see WHERE the
tracked-auto step's extra milliseconds live.

    python tools/tpu_tracked_trace.py [--batch 128]
"""

import argparse
import glob
import gzip
import json
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCOPES = ("tpu_face.detect", "tpu_face.nms", "tpu_face.mesh_warp",
          "tpu_face.mesh", "tpu_face.iris_warp", "tpu_face.iris")


def breakdown(logdir, steps):
    time.sleep(1)
    paths = sorted(glob.glob(
        f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        return None, {}
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    pid_names, tid_names = {}, {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = \
                    ev["args"].get("name", "")
    totals, grand = {}, 0.0
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
    return grand / 1e3 / steps, {k: v / 1e3 / steps
                                 for k, v in totals.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from tpu_face.tracking import FaceTracker

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    # the bench's mixed-content batch (bench.py _load_batch semantics)
    img = np.asarray(Image.open("/root/reference/test_data/man.jpg")
                     .convert("RGB").resize((540, 360),
                                            Image.BILINEAR), np.uint8)
    rng = np.random.default_rng(0)
    frames = [img]
    while len(frames) < B:
        f = np.roll(img, int(rng.integers(-60, 60)), axis=1)
        if len(frames) % 3 == 1:
            f = f[:, ::-1]
        frames.append(np.ascontiguousarray(f))
    batch = jnp.asarray(np.stack(frames))

    for profile in ("auto", "coverage"):
        tracker = FaceTracker(compute_dtype=jnp.bfloat16,
                              warp_profile=profile)
        r = tracker.step(batch)          # lock (full path)
        np.asarray(r.score)
        assert bool(tracker.tracking.all()), "failed to lock"
        for _ in range(2):               # compile + warm tracked path
            r = tracker.step(batch)
        np.asarray(r.score)

        logdir = f"/tmp/tpu_face_tracked_trace_{profile}"
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir, create_perfetto_trace=True):
            for _ in range(args.steps):
                r = tracker.step(batch)
            np.asarray(r.score)
        assert bool(tracker.tracking.all()), "lost mid-trace"

        total, totals = breakdown(logdir, args.steps)
        log(f"\n== tracked step, warp_profile={profile} ==")
        log(f"total device op time: {total:.2f} ms/step")
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:18]:
            log(f"  {k:45s} {v:8.2f} ms/step")
    print("TRACKED TRACE OK")


if __name__ == "__main__":
    main()

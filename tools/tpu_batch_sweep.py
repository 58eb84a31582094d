#!/usr/bin/env python
"""Re-sweep the canonical cascade batch size at round-4 HEAD.

The canonical batch 128 was picked by the round-2 sweep
(docs/PERF.md: 64/96/128/192/256/512/1024 -> 4.6/5.8/6.4/5.2/5.9/
5.6/5.4 kfps), but the program has changed substantially since:
rt16 warp configs, the rt-dispatch "auto" profile, exact full-pool
NMS, PReLU epilogue fusion, fused strip DMA.  This probe re-times
the default configuration (auto profile, hwc, bf16, mixed-content
batch) across batch sizes with the bench's hardened protocol
(3 windows per point, median, tiny-fetch completion).

    python tools/tpu_batch_sweep.py [--batches 96,112,128,144,160,192]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="96,112,128,144,160,192,256")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--layout", choices=["hwc", "planar"], default="hwc")
    ap.add_argument("--warp-profile", default="auto",
                    choices=["coverage", "speed", "auto"])
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _distinct_batch
    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    log = lambda m: print(m, file=sys.stderr, flush=True)
    img = load_image("/root/reference/test_data/man.jpg")
    rng = np.random.default_rng(0)
    frames = _distinct_batch(img, max(batches), rng)
    if args.layout == "planar":
        frames = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))

    cascade = FaceCascade(FaceDetectionModel.BACK_CAMERA,
                          compute_dtype=jnp.bfloat16,
                          input_layout=args.layout,
                          warp_profile=args.warp_profile)
    log(f"sweep: batches={batches} layout={args.layout} "
        f"profile={args.warp_profile}")
    rows = []
    for b in batches:
        batch = jnp.asarray(frames[:b])
        out = cascade(batch)            # compile this batch shape
        np.asarray(out.score.ravel()[0])
        for _ in range(3):              # warm
            out = cascade(batch)
        np.asarray(out.score.ravel()[0])
        window_fps = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cascade(batch)
            np.asarray(out.score.ravel()[0])
            window_fps.append(b * args.iters
                              / (time.perf_counter() - t0))
        fps = float(np.median(window_fps))
        spr = (max(window_fps) - min(window_fps)) / fps * 100.0
        rows.append((b, fps, spr))
        log(f"  batch {b:4d}: {fps:8.1f} fps "
            f"({b / fps * 1e3:6.2f} ms/step, spread {spr:.1f}%)")
    best = max(rows, key=lambda r: r[1])
    log(f"best: batch {best[0]} at {best[1]:.1f} fps")
    print({"rows": [(b, round(f, 1)) for b, f, _ in rows],
           "best_batch": best[0]})


if __name__ == "__main__":
    main()

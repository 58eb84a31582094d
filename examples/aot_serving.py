#!/usr/bin/env python
"""AOT serving cold-start: export the fused cascade once, then start
serving from the artifact without re-tracing (tpu_face.aot).

Two artifact kinds (both validated on TPU v5e):

- stablehlo (default, portable): 5.8 MB for the bf16 540p cascade;
  loading skips the fused-program Python trace and compiles through
  the persistent compilation cache (first-ever compile ~25 s on the
  tunneled dev TPU, then cached).
- executable (same-topology): 75.7 MB; loads in under a second with
  ZERO compile — the compiled PJRT binary itself is the artifact.

    python examples/aot_serving.py [--batch 8] [--kind executable]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kind", default="stablehlo",
                    choices=["stablehlo", "executable"])
    ap.add_argument("--artifact", default="/tmp/tpu_face_cascade.aot")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tpu_face import aot
    from tpu_face.pipeline import FaceCascade

    log = lambda m: print(m, flush=True)
    img = np.asarray(
        Image.open("/root/reference/test_data/man.jpg").convert("RGB"),
        np.uint8)
    batch = jnp.asarray(np.stack([img] * args.batch))
    h, w = img.shape[:2]

    # ---- build + export once (the "release" step) --------------------
    cascade = FaceCascade(compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    p = aot.save(cascade, args.artifact, batch=args.batch,
                 height=h, width=w, kind=args.kind)
    log(f"exported {args.kind} artifact: {p} "
        f"({p.stat().st_size / 1e6:.1f} MB, "
        f"{time.perf_counter() - t0:.1f}s)")

    # ---- serving process: attach the artifact, no tracing ------------
    # pad_batch=True: stream tails smaller than the exported batch
    # ride the same artifact (zero-pad + slice; bit-identical rows)
    server = FaceCascade(compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    aot.attach(server, p, pad_batch=True)
    log(f"attach: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    out = server.infer_batch(batch)
    np.asarray(out.score.ravel()[0])
    log(f"first batch: {time.perf_counter() - t0:.1f}s "
        f"(score={float(out.score[0]):.4f}, "
        f"valid={bool(out.face_valid[0])})")
    tail = server.infer_batch(batch[: max(1, args.batch // 2)])
    log(f"tail batch {int(tail.score.shape[0])}/{args.batch} via "
        f"pad_batch: score={float(tail.score[0]):.4f}")


if __name__ == "__main__":
    main()

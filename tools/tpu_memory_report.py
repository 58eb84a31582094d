#!/usr/bin/env python
"""HBM footprint of the flagship programs (XLA memory analysis).

Prints, for each serving configuration, the compiled program's
argument / output / temp / generated-code sizes as reported by
``compiled.memory_analysis()`` — the numbers that decide how many
concurrent programs (or how large a batch) fit one chip's 16 GB.
Compile-only: nothing executes, so it is safe to run while sizing a
deployment (compiles hit the persistent cache when warm).

    python tools/tpu_memory_report.py [--batch 128]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def _fmt(n):
    return f"{n / 1e6:9.1f} MB"


def _report(label, compiled):
    try:
        ma = compiled.memory_analysis()
    except Exception as e:  # backend without memory analysis
        print(f"{label:42s}  (memory_analysis unavailable: {e})",
              file=sys.stderr, flush=True)
        return
    args_b = getattr(ma, "argument_size_in_bytes", 0)
    out_b = getattr(ma, "output_size_in_bytes", 0)
    temp_b = getattr(ma, "temp_size_in_bytes", 0)
    code_b = getattr(ma, "generated_code_size_in_bytes", 0)
    alias_b = getattr(ma, "alias_size_in_bytes", 0)
    peak = args_b + out_b + temp_b - alias_b
    print(f"{label:42s} args {_fmt(args_b)}  out {_fmt(out_b)}  "
          f"temp {_fmt(temp_b)}  code {_fmt(code_b)}  "
          f"peak ~{_fmt(peak)}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.aot import _program_and_specs
    from tpu_face.pipeline import EmbedCascade, FaceCascade
    from tpu_face.tracking import FaceTracker, MultiFaceTracker

    B = args.batch
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})",
          file=sys.stderr, flush=True)

    configs = [
        (f"cascade 540p hwc b{B}",
         FaceCascade(compute_dtype=jnp.bfloat16), B, 360, 540),
        (f"cascade 1080p planar b{min(B, 64)}",
         FaceCascade(compute_dtype=jnp.bfloat16, input_layout="planar"),
         min(B, 64), 1080, 1920),
        (f"tracker 540p hwc b{B}",
         FaceTracker(compute_dtype=jnp.bfloat16), B, 360, 540),
        (f"multiface K=4 540p hwc b{min(B, 32)}",
         MultiFaceTracker(compute_dtype=jnp.bfloat16, max_faces=4),
         min(B, 32), 360, 540),
        (f"embed 540p hwc b{B}",
         EmbedCascade(compute_dtype=jnp.bfloat16,
                      embed_model_path="/root/repo/tpu_face/data/demo"),
         B, 360, 540),
    ]
    for label, obj, b, h, w in configs:
        fn, specs = _program_and_specs(obj, b, h, w)
        _report(label, fn.lower(*specs).compile())

    print("MEMORY REPORT OK")


if __name__ == "__main__":
    main()

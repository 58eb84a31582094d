#!/usr/bin/env python
"""Separable-collapse probe: DW(3x3)->1x1 pairs folded into one dense conv.

tools/cnn_floor.py shows the back CNN essentially AT its fused bf16
traffic bound (6.10 ms measured vs 5.70 ideal at batch 128) — going
faster requires REMOVING traffic, not scheduling it better.  The
collapse (lowering._collapse_separable_pairs) eliminates the per-block
[B,H,W,C] intermediate's HBM write+read exactly (the DW stage is
linear in all six nets), at the price of k*k x the pointwise FLOPs and
small-C MXU lane waste.  The iris net is the other target: 3.21 ms at
2.3x its loose bound, latency-bound across 55 tiny sequential convs —
collapsing removes 26 of them.

Times each cascade net isolated (bf16, cascade-representative batch)
under per-channel-width collapse policies.

    python tools/tpu_sep_collapse_probe.py [--batch 128] [--iters 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(fn, *args, iters=20):
    _force(fn(*args))
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.compiler.lowering import Graph, build_jax_fn

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    rng = np.random.default_rng(0)
    nets = {
        "back": ("face_detection_back", (B, 256, 256, 3)),
        "mesh": ("face_landmark", (B, 192, 192, 3)),
        "iris": ("iris_landmark", (2 * B, 64, 64, 3)),
    }
    policies = {
        "baseline": False,
        "all": True,
        "ci<=24": (lambda ci, co, h: ci <= 24),
        "ci<=48": (lambda ci, co, h: ci <= 48),
    }
    for nick, (name, shape) in nets.items():
        x = jnp.asarray(rng.random(shape, np.float32))
        base = None
        ref_out = None
        for pname, pol in policies.items():
            g = Graph(f"/root/repo/tpu_face/data/{name}.npz",
                      collapse_separable=pol)
            n_dw = sum(1 for n in g.ops if n["op"] == "DEPTHWISE_CONV_2D")
            net = build_jax_fn(g, compute_dtype=jnp.bfloat16)
            jf = jax.jit(net)
            t = bench(jf, x, iters=args.iters)
            out = [np.asarray(o) for o in jf(x)]
            if ref_out is None:
                ref_out = out
            derr = max(float(np.max(np.abs(a - b)))
                       for a, b in zip(ref_out, out))
            if base is None:
                base = t
            log(f"{nick:5s} {pname:9s} ops {len(g.ops):3d} dw {n_dw:2d}  "
                f"{t:6.2f} ms  ({base / t:4.2f}x)  "
                f"max|d-out| vs baseline {derr:.2e} (bf16 compute)")
        log("")


if __name__ == "__main__":
    main()

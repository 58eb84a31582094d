#!/usr/bin/env python
"""int8 conv feasibility probe: does XLA/v5e run int8 convolutions
fast enough to justify a quantized CNN path?

The cascade CNNs are HBM-bound (tools/cnn_floor.py): int8 activations
would halve the traffic bound.  This times a BlazeFace-typical conv
stack in bf16 vs int8 (weights+activations, int32 accum).  If int8
is not ~1.5x+ faster, a quantized path cannot pay for its accuracy
risk and the idea is dead.

    python tools/tpu_int8_probe.py [--batch 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
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
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    rng = np.random.default_rng(0)
    H = W = 128
    C = 24
    DEPTH = 8   # back-model-ish stack of 3x3 convs at 24 channels

    wk = [rng.integers(-127, 127, (3, 3, C, C)).astype(np.int8)
          for _ in range(DEPTH)]
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)
                                  ).astype(np.int8))
    dn = lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                    ("NHWC", "HWIO", "NHWC"))

    def stack_bf16(x, ws):
        x = x.astype(jnp.bfloat16)
        for w in ws:
            x = lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            x = jnp.maximum(x, 0)
        return x

    def stack_int8(x, ws):
        for w in ws:
            acc = lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # requantize: shift-scale back to int8 (stand-in epilogue)
            x = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return x

    ws8 = [jnp.asarray(w) for w in wk]
    t_bf = bench(jax.jit(lambda x: stack_bf16(x, ws8)), x8)
    log(f"bf16 conv stack  ({DEPTH}x3x3@{C}ch {H}x{W}) {t_bf:7.2f} ms")
    try:
        t_i8 = bench(jax.jit(lambda x: stack_int8(x, ws8)), x8)
        log(f"int8 conv stack  ({DEPTH}x3x3@{C}ch {H}x{W}) {t_i8:7.2f} "
            f"ms ({t_bf / t_i8:.2f}x vs bf16)")
    except Exception as e:
        log(f"int8 stack failed: {type(e).__name__}: {str(e)[:200]}")
    print("INT8 PROBE OK")


if __name__ == "__main__":
    main()

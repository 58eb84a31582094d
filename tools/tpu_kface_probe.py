#!/usr/bin/env python
"""K-face cascade bottleneck probes: crowded NMS + nested-vmap mesh CNN.

The K=4 crowd trace (tools/tpu_trace_breakdown.py --crowd) showed the
weighted NMS at nms_top_m=2304 costing ~7.4 ms/step and the mesh CNN
under the nested [B][K] vmaps ~7.2 ms/step at effective batch 128 —
where the flat batch-128 cascade pays 0.23 + 0.84 ms.  This probe
times both in isolation:

1. weighted NMS: the pre-round-3 sort + [N,N]-matrix scan (inlined
   here as the baseline) vs the exact full-pool argmax scan now in
   ops/postprocess.py, vmapped over 32 frames of 2304 candidates.
2. the face-landmark CNN under vmap(vmap(net)) on [32, 4, 192, 192, 3]
   vs net on the flat [128, 192, 192, 3].

    python tools/tpu_kface_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _time(fn, *args, iters=30):
    out = jax_block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters * 1e3


def jax_block(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return out


def main():
    global jax
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.ops import postprocess as post

    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    B, N, K = 32, 2304, 4
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (B, N, 1, 2)).astype(np.float32)
    sizes = rng.uniform(0.05, 0.2, (B, N, 1, 2)).astype(np.float32)
    data = np.concatenate([centers - sizes / 2, centers + sizes / 2,
                           np.repeat(centers, 6, axis=2)], axis=2)
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    valid = scores > 0.5

    def old_nms(d, s, v):
        """Pre-round-3 path: top_k sort + [N, N] IoU matrix."""
        dd, sc, vv = post._sort_and_truncate(d, s, v, N)
        boxes = jnp.stack([dd[:, 0, 0], dd[:, 0, 1], dd[:, 1, 0],
                           dd[:, 1, 1]], axis=-1)
        iou = post._iou_matrix(boxes)

        def body(carry, _):
            alive, stopped = carry
            any_alive = jnp.any(alive)
            top = jnp.argmax(alive)
            cand = alive & (iou[top] > 0.3)
            any_cand = jnp.any(cand)
            w = jnp.where(cand, sc, 0.0)
            merged = (jnp.tensordot(w, dd, axes=1)
                      / jnp.maximum(w.sum(), 1e-12))
            out = (jnp.where(any_cand, merged, dd[top]), sc[top],
                   any_alive & ~stopped)
            alive = alive & ~cand & ~(jnp.arange(alive.shape[0]) == top)
            return (alive, stopped | (~any_cand)), out

        (_, _), outs = jax.lax.scan(body, (vv, jnp.asarray(False)),
                                    None, length=K)
        return outs

    jit_old = jax.jit(jax.vmap(old_nms))
    jit_new = jax.jit(jax.vmap(
        lambda d, s, v: post.weighted_nms(d, s, v, max_outputs=K)))
    d, s, v = jnp.asarray(data), jnp.asarray(scores), jnp.asarray(valid)
    ms_old = _time(jit_old, d, s, v)
    ms_new = _time(jit_new, d, s, v)
    o_d, _, o_v = jit_old(d, s, v)
    n_d, _, n_v = jit_new(d, s, v)
    par = (np.allclose(np.asarray(o_d), np.asarray(n_d), atol=1e-5)
           and np.array_equal(np.asarray(o_v), np.asarray(n_v)))
    log(f"weighted NMS B={B} N={N} K={K}: "
        f"sort+matrix {ms_old:.2f} ms -> full-pool scan {ms_new:.2f} ms "
        f"(parity={par})")

    # ---- mesh CNN: nested vmap vs flat batch -------------------------
    from tpu_face.compiler.lowering import Graph, build_jax_fn
    from tpu_face.models.face_landmark import _DATA_DIR

    g = Graph(_DATA_DIR / "face_landmark.npz")
    net = build_jax_fn(g, compute_dtype=jnp.bfloat16)
    x4 = jnp.asarray(rng.uniform(0, 1, (B, K, 192, 192, 3))
                     .astype(np.float32))
    xf = x4.reshape(B * K, 192, 192, 3)
    nested = jax.jit(jax.vmap(jax.vmap(lambda t: net(t[None]))))
    flat = jax.jit(lambda t: net(t))
    ms_nested = _time(nested, x4)
    ms_flat = _time(flat, xf)
    a = np.asarray(nested(x4)[0]).reshape(B * K, -1)
    b = np.asarray(flat(xf)[0]).reshape(B * K, -1)
    log(f"mesh CNN eff-batch {B * K}: nested vmap {ms_nested:.2f} ms "
        f"vs flat {ms_flat:.2f} ms "
        f"(parity={np.allclose(a, b, atol=2e-2)})")
    print("KFACE PROBE OK")


if __name__ == "__main__":
    main()

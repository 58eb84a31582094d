#!/usr/bin/env python
"""PReLU formulation probe for the mesh/iris nets.

tools/cnn_floor.py shows the PReLU nets run near their NAIVE traffic
bound (every op materializing) while the ReLU-based detector runs at
~87% of the fused bound — suggesting XLA fails to fuse the select-based
PReLU into adjacent ops.  Times the mesh and iris nets under different
PReLU formulations; "relu" is numerically WRONG and only bounds the
possible fusion win.

    python tools/tpu_prelu_probe.py [--batch 128]
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
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_face_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.compiler import lowering
    from tpu_face.compiler.lowering import Graph, build_jax_fn

    B = args.batch
    log = lambda m: print(m, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")

    rng = np.random.default_rng(0)
    mesh_in = jnp.asarray(rng.random((B, 192, 192, 3), np.float32))
    iris_in = jnp.asarray(rng.random((2 * B, 64, 64, 3), np.float32))
    mesh_g = Graph("/root/repo/tpu_face/data/face_landmark.npz")
    iris_g = Graph("/root/repo/tpu_face/data/iris_landmark.npz")

    forms = {
        "where (current)": lambda x, a: jnp.where(x >= 0, x, x * a),
        "max+alpha*min": lambda x, a: (jnp.maximum(x, 0)
                                       + a * jnp.minimum(x, 0)),
        "relu-relu": lambda x, a: (jax.nn.relu(x)
                                   - a * jax.nn.relu(-x)),
        "relu (WRONG, bound)": lambda x, a: jnp.maximum(x, 0),
    }
    ref = {}
    for name, fn in forms.items():
        lowering._prelu = fn
        mesh_net = build_jax_fn(mesh_g, compute_dtype=jnp.bfloat16)
        iris_net = build_jax_fn(iris_g, compute_dtype=jnp.bfloat16)
        jm = jax.jit(lambda x: mesh_net(x))
        ji = jax.jit(lambda x: iris_net(x))
        tm = bench(jm, mesh_in)
        ti = bench(ji, iris_in)
        out = np.asarray(jm(mesh_in)[0][0])
        if not ref:
            ref["m"] = out
        log(f"{name:<20} mesh {tm:6.2f} ms   iris(2B) {ti:6.2f} ms   "
            f"|d mesh|max {np.abs(out - ref['m']).max():.5f}")
    print("PRELU PROBE OK")


if __name__ == "__main__":
    main()

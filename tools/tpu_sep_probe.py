#!/usr/bin/env python
"""Probe alternative lowerings of the separable warp's x-contraction.

Current: t1 = wy@img -> [Ho, W, C]; out = einsum('ox,hxc->hoc', wx, t1)
(a batched matvec per output row).  Variants: transpose t1 to [W, Ho*C]
and run ONE plain MXU matmul; dot_general with explicit batch dims.

    python tools/tpu_sep_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_face_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpu_face.ops import image as image_ops

B, H, W, HO, WO = 256, 360, 540, 256, 256
log = lambda m: print(m, file=sys.stderr, flush=True)


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(f, *args, iters=20):
    _force(f(*args))
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def coords(image):
    whole = jnp.array([0.5 * W, 0.5 * H, W, H, 0.0], jnp.float32)
    sx, sy, _ = image_ops._source_coords(whole, (WO, HO), True, False)
    return sx, sy


def weights(image):
    sx, sy = coords(image)
    xs, ys = sx[0], sy[:, 0]
    wx = image_ops._hat(
        jnp.arange(W, dtype=jnp.float32)[None, :] - xs[:, None])
    wy = image_ops._hat(
        jnp.arange(H, dtype=jnp.float32)[None, :] - ys[:, None])
    return wx, wy


def v_current(image):
    imgf = image.astype(jnp.float32)
    wx, wy = weights(image)
    t1 = jnp.dot(wy, imgf.reshape(H, -1)).reshape(HO, W, 3)
    return jnp.einsum("ox,hxc->hoc", wx, t1)


def v_transpose_matmul(image):
    imgf = image.astype(jnp.float32)
    wx, wy = weights(image)
    t1 = jnp.dot(wy, imgf.reshape(H, -1)).reshape(HO, W, 3)
    t1t = t1.transpose(1, 0, 2).reshape(W, HO * 3)
    out = jnp.dot(wx, t1t)                     # [WO, HO*3]
    return out.reshape(WO, HO, 3).transpose(1, 0, 2)


def v_two_matmuls_chw(image):
    # contract x FIRST on a [C*H, W] layout, then y
    imgf = image.astype(jnp.float32)
    wx, wy = weights(image)
    chw = imgf.transpose(2, 0, 1).reshape(3 * H, W)
    t1 = jnp.dot(chw, wx.T)                    # [3H, WO]
    t1 = t1.reshape(3, H, WO).transpose(1, 0, 2).reshape(H, 3 * WO)
    out = jnp.dot(wy, t1)                      # [HO, 3*WO]
    return out.reshape(HO, 3, WO).transpose(0, 2, 1)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind}); batch={B}")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)
                                    ).astype(np.uint8))

    ref = None
    for name, fn in [("einsum (current)", v_current),
                     ("transpose+matmul", v_transpose_matmul),
                     ("x-first CHW", v_two_matmuls_chw)]:
        f = jax.jit(jax.vmap(fn))
        out = np.asarray(f(imgs[:2]))
        if ref is None:
            ref = out
        else:
            assert np.abs(out - ref).max() < 1e-2, (name,
                                                    np.abs(out - ref).max())
        t = bench(f, imgs)
        log(f"{name:20s}: {t:7.2f} ms")
    print("SEP PROBE OK")


if __name__ == "__main__":
    main()

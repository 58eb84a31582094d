"""NEGATIVE-RESULT prototype: K fused DW3x3+1x1+residual+relu layers
in one Pallas kernel (overlapped row chunks DMA'd from HBM, channels on
sublanes, flat [C, R*W] lanes).

Measured on v5e-1 (batch 256, 7 blocks @ 128x128x24): 21.8 ms vs XLA's
18.3 ms for the same sequence, and the last measured version still had
a numerical bug (max diff ~4) — XLA's conv pipeline with its own fusion
is already competitive, and beating it requires at least DMA double
buffering across chunks plus removing the per-layer jnp.pad copies.
Kept as a starting point; see docs/PERF.md "Known headroom".
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_face_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp, time
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, K = 256, 128, 128, 24, 7
CHUNK = 64
HALO = K + 1
REXT = CHUNK + 2 * HALO
HWE = REXT * W
rng = np.random.default_rng(0)
x_nhwc = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
wd = jnp.asarray(rng.normal(size=(K, 3, 3, C)).astype(np.float32) * 0.2)
wp = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.2)
bias = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))


def xla_blocks(x):
    for k in range(K):
        y = lax.conv_general_dilated(
            x, wd[k].reshape(3, 3, 1, C), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, preferred_element_type=jnp.float32)
        y = lax.conv_general_dilated(
            y, wp[k].T.reshape(1, 1, C, C), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + bias[k]
        x = jnp.maximum(y + x, 0.0)
    return x


def kernel(x_hbm, wd_ref, wp_ref, b_ref, o_ref, xs, sem):
    # x_hbm [B, C, Hp*W] (ANY); wd_ref [C, K*9]; wp_ref [K*C, C];
    # b_ref [C, K]; o_ref [1, C, CHUNK*W]; xs scratch [C, REXT*W]
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[i, :, pl.ds(j * CHUNK * W, HWE)], xs, sem)
    copy.start()
    copy.wait()

    x = xs[:, :]                                  # [C, HWE]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, HWE), 1)
    col = iota % W
    left_ok = (col != 0).astype(jnp.float32)
    right_ok = (col != W - 1).astype(jnp.float32)

    for k in range(K):
        xpad = jnp.pad(x, ((0, 0), (W + 1, W + 1)))
        acc = None
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                s = (dy * W + dx)
                tap = xpad[:, s:s + HWE]
                wcol = wd_ref[:, k * 9 + dy * 3 + dx][:, None]  # [C,1]
                term = tap * wcol
                if dx == 0:
                    term = term * left_ok
                elif dx == 2:
                    term = term * right_ok
                acc = term if acc is None else acc + term
        y = jnp.dot(wp_ref[k * C:(k + 1) * C, :], acc,
                    preferred_element_type=jnp.float32)
        x = jnp.maximum(y + b_ref[:, k][:, None] + x, 0.0)
    o_ref[0] = x[:, HALO * W:(HALO + CHUNK) * W]


def pallas_blocks(x):
    xc = x.transpose(0, 3, 1, 2)                 # [B, C, H, W]
    xc = jnp.pad(xc, ((0, 0), (0, 0), (HALO, HALO), (0, 0)))
    xc = xc.reshape(B, C, (H + 2 * HALO) * W)
    n_chunks = H // CHUNK
    out = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((C, K * 9), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, CHUNK * W), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, HWE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xc, wd.reshape(K * 9, C).T, wp.reshape(K * C, C), bias.T)
    return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)


f_xla = jax.jit(xla_blocks)
f_pl = jax.jit(pallas_blocks)
a = jax.block_until_ready(f_xla(x_nhwc))
b = jax.block_until_ready(f_pl(x_nhwc))
print("max diff:", float(jnp.max(jnp.abs(a - b))))

for name, f in [("xla 7-block", f_xla), ("pallas fused", f_pl)]:
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(x_nhwc)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/step")

"""NEGATIVE-RESULT (v2, definitive): K fused DW3x3+1x1+residual+relu
layers per VMEM residency, with the three fixes the v1 result called
for (docs/experiments/fused_block_prototype.py):

1. numerics: halo rows outside the image are re-zeroed after every
   layer (v1 let relu(bias) values evolve in the halo, leaking into the
   interior at the next layer -> max diff ~4); v2 matches XLA to 0.21
   on outputs of scale ~15 (pure bf16 reduction-order noise);
2. bf16 activations end-to-end (halves HBM + VMEM traffic);
3. DMA double buffering: chunk j+1's input streams in while chunk j
   computes (2-slot scratch).

Measured on v5e-1 (batch 256, 7 blocks @ 128x128x24, bf16; hardened
timing protocol — forced one-scalar materialization, see docs/PERF.md):
    XLA 7-block sequence : 12.0 ms/step
    this kernel          : 18.0 ms/step
CONCLUSION: XLA wins 1.5x and the loss is structural, not tunable.  The
kernel's floor is the depthwise conv expressed as 9 shifted VPU FMAs
over a [C=24, 10240] layout: ~12 vector passes/layer x 7 layers ~= 21us
per grid step = 10.7 ms total across 512 steps — equal to XLA's ENTIRE
time — before the 1x1 MXU dots, masking and layout overhead.  Memory
was never the binding constraint once XLA runs bf16 (its fused conv
pipeline keeps the stage at ~10.7 ms vs the ~3.4 ms pure-traffic floor,
but the VPU formulation cannot reach even that).  Beating XLA here
would need the DW conv itself on the MXU (banded/shifted weight
matrices), which costs 128/24 = 5.3x padding waste per dot — also a
loss.  The landed alternatives: PAD->conv folding at graph load
(compiler/lowering.py), plane sharing across warps, and bf16 nets.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_face_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, K = 256, 128, 128, 24, 7
CHUNK = 64
HALO = K  # one halo row per fused layer each side
REXT = CHUNK + 2 * HALO
HWE = REXT * W
DTYPE = jnp.bfloat16

rng = np.random.default_rng(0)
x_nhwc = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
wd = jnp.asarray(rng.normal(size=(K, 3, 3, C)).astype(np.float32) * 0.2)
wp = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.2)
bias = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))


def xla_blocks(x):
    x = x.astype(DTYPE)
    for k in range(K):
        y = lax.conv_general_dilated(
            x, wd[k].reshape(3, 3, 1, C).astype(DTYPE), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, preferred_element_type=DTYPE)
        y = lax.conv_general_dilated(
            y, wp[k].T.reshape(1, 1, C, C).astype(DTYPE), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DTYPE) + bias[k].astype(DTYPE)
        x = jnp.maximum(y + x, 0.0)
    return x.astype(jnp.float32)


def kernel(x_hbm, wd_ref, wp_ref, b_ref, o_ref, xs, sem):
    # x_hbm [B, C, Hp*W] bf16 (ANY); wd_ref [C, K*9] f32;
    # wp_ref [K*C, C] bf16; b_ref [C, K] f32;
    # o_ref [1, C, CHUNK*W] bf16; xs scratch [2, C, HWE] bf16
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    slot = j % 2

    def dma(jj, s):
        return pltpu.make_async_copy(
            x_hbm.at[i, :, pl.ds(jj * CHUNK * W, HWE)], xs.at[s], sem.at[s])

    @pl.when(j == 0)
    def _():
        dma(0, 0).start()

    @pl.when(j + 1 < nj)
    def _():
        dma(j + 1, (j + 1) % 2).start()

    dma(j, slot).wait()
    x = xs[slot]                                   # [C, HWE] bf16

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, HWE), 1)
    col = iota % W
    row = iota // W  # extended-chunk row index 0..REXT-1
    left_ok = (col != 0).astype(DTYPE)
    right_ok = (col != W - 1).astype(DTYPE)
    grow = row + j * CHUNK - HALO  # global image row of each position

    for k in range(K):
        # rows outside the image must be EXACTLY zero at every layer
        # (per-layer SAME padding); only rows that can still influence
        # the output need computing, but masking is cheaper than
        # shrinking the extent
        in_img = ((grow >= 0) & (grow < H)).astype(DTYPE)
        x = x * in_img
        xpad = jnp.pad(x, ((0, 0), (W + 1, W + 1)))
        acc = None
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                s = dy * W + dx
                tap = xpad[:, s:s + HWE]
                wcol = wd_ref[:, k * 9 + dy * 3 + dx].astype(DTYPE)[:, None]
                term = tap * wcol
                if dx == 0:
                    term = term * left_ok
                elif dx == 2:
                    term = term * right_ok
                acc = term if acc is None else acc + term
        y = jnp.dot(wp_ref[k * C:(k + 1) * C, :], acc,
                    preferred_element_type=jnp.float32)
        x = jnp.maximum(y + b_ref[:, k].astype(jnp.float32)[:, None]
                        + x.astype(jnp.float32), 0.0).astype(DTYPE)
    o_ref[0] = x[:, HALO * W:(HALO + CHUNK) * W]


def pallas_blocks(x):
    xc = x.astype(DTYPE).transpose(0, 3, 1, 2)     # [B, C, H, W]
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
        out_shape=jax.ShapeDtypeStruct((B, C, H * W), DTYPE),
        scratch_shapes=[
            pltpu.VMEM((2, C, HWE), DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xc, wd.reshape(K * 9, C).T, wp.reshape(K * C, C).astype(DTYPE),
      bias.T)
    return (out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
            .astype(jnp.float32))


f_xla = jax.jit(xla_blocks)
f_pl = jax.jit(pallas_blocks)
a = jax.block_until_ready(f_xla(x_nhwc))
b = jax.block_until_ready(f_pl(x_nhwc))
print("max diff:", float(jnp.max(jnp.abs(a - b))),
      " (bf16 scale:", float(jnp.max(jnp.abs(a))), ")")

def _force(out):
    # in-order device streams: one scalar fetch of the last result
    # proves all prior iterations finished (block_until_ready can
    # no-op through the tunneled backend)
    np.asarray(out.ravel()[0])  # on-device slice, 4-byte fetch


for name, f in [("xla 7-block bf16", f_xla), ("pallas fused v2", f_pl)]:
    for _ in range(3):
        _force(f(x_nhwc))
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(x_nhwc)
    _force(o)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/step")

"""Pallas TPU kernel for the blocked bilinear warp gather.

Why a kernel: the cascade warps each frame with a per-frame rotated ROI.
XLA lowers the per-pixel bilinear gather to serialized row loads (~0.2
GB/s effective on v5e), and the pure-XLA hat-matmul alternative has to
materialize [P, W] weight matrices in HBM per row-tile (tens of GB/s of
pure weight traffic).  Inside the kernel the hat weights live only in
VMEM/registers, the source window is a true dynamic slice (contiguous
DMA, no gather), and the x-contraction rides the MXU.

The output is processed in 8x`CW` pixel blocks.  For each block:

  ystart    = floor(min ys) aligned down to 8 rows     (sublane align)
  xa        = floor(min xs) aligned down to 128 lanes  (lane align)
  strip256  = plane[ystart : ystart+band, xa : xa+256]  (dynamic slice)
  window    = roll(strip256, -(xmin - xa))[:, :128]     (lane roll)
  wx[k, p]  = hat(xmin + k - xs[p])                     (VPU, in VMEM)
  t1        = window.T-free dot: [band, 128] @ [128, P] (MXU)
  out[p]    = sum_b hat(ystart + b - ys[p]) * t1[b, p]  (VPU reduce)

This reproduces exactly the two-tap zero-border bilinear of
ops/image.py:bilinear_sample whenever the block's source extent fits the
static windows:

  x: CW*|dx/du| + 8*|dx/dv| + 2 <= 126
  y: 8*|dy/dv| + CW*|dy/du| + 2 <= band - 7

(derivative magnitudes = roi_scale*cos/sin terms).  With CW=32 that
admits ROI scales up to ~3.9x output size and rotations beyond +-0.4
rad at typical scales — far outside the cascade's operating envelope;
the XLA gather path remains the exact general fallback.  fp differences
are dot-order only; with bf16 dots (uint8 pixels are exact in bf16) at
most one uint8 quantization level.

Grid is (T,) row-tiles per frame with the column blocks unrolled inside,
and the image-plane block index is constant, so the frame stays resident
in VMEM across all its tiles; jax.vmap batches the call by prepending a
batch grid dimension.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8   # output rows per block (sublane granularity)
XWIN = 128     # working x-window (lanes)
XLOAD = 2 * XWIN  # aligned load width before the roll


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_kernel(r_ref, g_ref, b_ref, xs_ref, ys_ref, out_ref, *,
                 band, dot_dtype, cw):
    """One row-tile: CB column blocks of [ROW_TILE, cw] output pixels.

    r/g/b_ref: [Hp, Wp] channel planes (padded);
    xs_ref/ys_ref: [1, CB, 1, PB] block-flattened coords;
    out_ref: [1, 3, CB, PB].
    """
    h = r_ref.shape[0]
    w = r_ref.shape[1]
    cb_count = xs_ref.shape[1]
    pb = xs_ref.shape[3]

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (XWIN, pb), 0
                                      ).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (band, pb), 0
                                      ).astype(jnp.float32)

    for cb in range(cb_count):
        xs = xs_ref[0, cb]                                # [1, PB]
        ys = ys_ref[0, cb]                                # [1, PB]

        ymin = jnp.floor(jnp.min(ys)).astype(jnp.int32)
        ystart = jnp.clip((ymin // 8) * 8, 0, h - band)
        ystart = pl.multiple_of(ystart, 8)

        xmin = jnp.clip(jnp.floor(jnp.min(xs)).astype(jnp.int32),
                        0, w - 1)
        xa = jnp.clip((xmin // XWIN) * XWIN, 0, w - XLOAD)
        xa = pl.multiple_of(xa, XWIN)
        off = xmin - xa

        wx = _hat(iota_x + xmin.astype(jnp.float32) - xs)  # [XWIN, PB]
        wy = _hat(iota_y + ystart.astype(jnp.float32) - ys)  # [band, PB]
        if dot_dtype is not None:
            wx = wx.astype(dot_dtype)

        for c, ref in enumerate((r_ref, g_ref, b_ref)):
            strip = ref[pl.ds(ystart, band), pl.ds(xa, XLOAD)]
            window = pltpu.roll(strip, -off, axis=1)[:, :XWIN]
            if dot_dtype is not None:
                window = window.astype(dot_dtype)
            t1 = jnp.dot(window, wx,
                         preferred_element_type=jnp.float32)  # [band, PB]
            out_ref[0, c, cb, :] = jnp.sum(wy * t1, axis=0)


def warp_sample(image_chw: jnp.ndarray, src_x: jnp.ndarray,
                src_y: jnp.ndarray, band: int = 48,
                dot_dtype=jnp.bfloat16, interpret: bool = False
                ) -> jnp.ndarray:
    """Bilinear-sample one frame on the TPU MXU (see module docstring).

    Args:
      image_chw: [3, H, W] f32 source frame (channel-major planes).
      src_x, src_y: [Ho, Wo] source coordinates.
      band: static vertical source window (multiple of 8).
      dot_dtype: matmul input dtype (None = full f32 dots).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns: [Ho, Wo, 3] f32 sampled pixels.
    """
    _, h, w = image_chw.shape
    ho, wo = src_x.shape
    assert ho % ROW_TILE == 0, (ho, ROW_TILE)
    cw = max(d for d in (32, 16, 8, 4, 2, 1) if wo % d == 0)
    t = ho // ROW_TILE
    cb = wo // cw
    pb = ROW_TILE * cw

    # pad planes so every aligned [band, XLOAD] window exists
    hp = max(-(-h // 8) * 8, band)
    wp = max(-(-w // XWIN) * XWIN, XLOAD)
    band = min(band, hp)
    planes = jnp.pad(image_chw.astype(jnp.float32),
                     ((0, 0), (0, hp - h), (0, wp - w)))

    # [Ho, Wo] -> [T, CB, 1, PB] block-row-major
    def blocked(a):
        return (a.reshape(t, ROW_TILE, cb, cw)
                .transpose(0, 2, 1, 3)
                .reshape(t, cb, 1, pb))

    out = pl.pallas_call(
        partial(_warp_kernel, band=band, dot_dtype=dot_dtype, cw=cw),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, 1, pb), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, 1, pb), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, cb, pb), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 3, cb, pb), jnp.float32),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], blocked(src_x), blocked(src_y))

    # [T, 3, CB, PB] -> [Ho, Wo, 3]
    return (out.reshape(t, 3, cb, ROW_TILE, cw)
            .transpose(0, 3, 2, 4, 1)
            .reshape(ho, wo, 3))

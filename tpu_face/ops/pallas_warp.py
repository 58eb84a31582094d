"""Pallas TPU kernel for the banded bilinear warp gather.

Why a kernel: the cascade warps each frame with a per-frame rotated ROI.
XLA lowers the per-pixel bilinear gather to serialized row loads (~0.2
GB/s effective on v5e), and the pure-XLA hat-matmul alternative has to
materialize [P, W] weight matrices in HBM per row-tile (tens of GB/s of
pure weight traffic).  Inside a kernel the hat weights live only in
VMEM/registers, the source strip is a true dynamic slice (contiguous DMA,
no gather), and the y-contraction rides the MXU:

  for each tile of 8 output rows (P = 8*Wo output pixels):
    ystart  = floor(min ys)                    (scalar)
    wy[P,b] = hat(ystart + b - ys[p])          (VPU, VMEM-only)
    strip   = img[c, ystart : ystart+band, :]  (dynamic slice DMA)
    t1[P,W] = wy @ strip                       (MXU)
    out[p]  = sum_x hat(x - xs[p]) * t1[p, x]  (VPU masked reduce)

Exactly the two-tap zero-border bilinear of ops/image.py:bilinear_sample
whenever the tile's vertical source extent fits in ``band`` (see
ops/image.py:mxu_sample for the envelope); fp differences are dot-order
only.

Grid is (T,) per frame and the image block index is constant across t,
so the frame stays resident in VMEM for all its tiles; jax.vmap batches
the call by prepending a batch grid dimension.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8  # output rows per grid step


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_kernel(r_ref, g_ref, b_ref, xs_ref, ys_ref, out_ref, *,
                 band, dot_dtype):
    """One tile of ROW_TILE output rows.

    Shapes (all loads 2D-native — Mosaic supports neither cross-lane
    reshapes nor 3D strided loads): r/g/b_ref [H, W] channel planes;
    xs_ref/ys_ref [1, ROW_TILE, Wo]; out_ref [1, 3, ROW_TILE, Wo].
    Per output row r: wx [W, Wo] hat weights; t1 = strip @ wx on the
    MXU ([band, W] @ [W, Wo]); then the y-contraction is a masked
    sublane reduce with wy [band, Wo].
    """
    h = r_ref.shape[0]
    w = r_ref.shape[1]
    wo = xs_ref.shape[2]

    xs_all = xs_ref[0]                                   # [R, Wo]
    ys_all = ys_ref[0]                                   # [R, Wo]
    # sublane-aligned band start (vector loads need 8-row alignment);
    # the 0..7 alignment slack comes out of the band envelope
    ystart = jnp.clip(jnp.floor(jnp.min(ys_all)).astype(jnp.int32),
                      0, h - band)
    ystart = pl.multiple_of((ystart // 8) * 8, 8)
    ystart_f = ystart.astype(jnp.float32)

    strips = []
    for ref in (r_ref, g_ref, b_ref):
        s = ref[pl.ds(ystart, band), :]                  # [band, W]
        strips.append(s.astype(dot_dtype) if dot_dtype is not None else s)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, wo), 0
                                      ).astype(jnp.float32)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (band, wo), 0
                                      ).astype(jnp.float32)

    for r in range(ROW_TILE):
        wx = _hat(iota_w - xs_all[r:r + 1, :])           # [W, Wo]
        wy = _hat(iota_b + ystart_f - ys_all[r:r + 1, :])  # [band, Wo]
        if dot_dtype is not None:
            wx = wx.astype(dot_dtype)
        for c in range(3):
            t1 = jnp.dot(strips[c], wx,
                         preferred_element_type=jnp.float32)  # [band, Wo]
            out_ref[0, c, r, :] = jnp.sum(wy * t1, axis=0)


def warp_sample(image_chw: jnp.ndarray, src_x: jnp.ndarray,
                src_y: jnp.ndarray, band: int = 64,
                dot_dtype=jnp.bfloat16, interpret: bool = False
                ) -> jnp.ndarray:
    """Bilinear-sample one frame on the TPU MXU.

    Args:
      image_chw: [3, H, W] f32 source frame (channel-major so the strip
        slice is 2D contiguous).
      src_x, src_y: [Ho, Wo] source coordinates.
      band: static vertical band (source rows per ROW_TILE output rows).
        Must satisfy ROW_TILE*roi_h/Ho*cos + Wo_scale*|sin| + 2 <= band.
      dot_dtype: matmul input dtype.  uint8 pixel values are EXACT in
        bfloat16 (8 significand bits hold 0..255), so bf16 only rounds
        the hat weights (~2^-8 relative — below one quantization level);
        pass None to keep full f32 dots.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns: [Ho, Wo, 3] f32 sampled pixels.
    """
    _, h, w = image_chw.shape
    ho, wo = src_x.shape
    band = min(band, h)
    assert ho % ROW_TILE == 0, (ho, ROW_TILE)
    t = ho // ROW_TILE
    p = ROW_TILE * wo

    xs = src_x.reshape(t, ROW_TILE, wo)
    ys = src_y.reshape(t, ROW_TILE, wo)

    plane = pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    coords = pl.BlockSpec((1, ROW_TILE, wo), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_warp_kernel, band=band, dot_dtype=dot_dtype),
        grid=(t,),
        in_specs=[plane, plane, plane, coords, coords],
        out_specs=pl.BlockSpec((1, 3, ROW_TILE, wo),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 3, ROW_TILE, wo), jnp.float32),
        interpret=interpret,
    )(image_chw[0], image_chw[1], image_chw[2], xs, ys)

    # [T, 3, R, Wo] -> [Ho, Wo, 3]
    return out.transpose(0, 2, 3, 1).reshape(ho, wo, 3)

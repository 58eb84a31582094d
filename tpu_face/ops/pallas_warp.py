"""Pallas TPU kernel for the blocked bilinear warp gather.

Why a kernel: the cascade warps each frame with a per-frame rotated ROI.
XLA lowers the per-pixel bilinear gather to serialized row loads (~0.2
GB/s effective on v5e), and the pure-XLA hat-matmul alternative has to
materialize [P, W] weight matrices in HBM per row-tile (tens of GB/s of
pure weight traffic).  Inside the kernel the hat weights live only in
VMEM/registers, the source window is a true dynamic slice (contiguous
DMA, no gather), and the x-contraction rides the MXU.

The output is processed in 8x`CW` pixel blocks, `CB` blocks per grid
step (one step per 8 output rows; finer grids pay too much per-step
pipeline overhead, and predicated per-tile block counts measurably
stall the pipeline — every grid step runs the same straight-line code).
For each block:

  ystart    = floor(min ys) aligned down to 8 sublanes
  xa        = floor(min xs) aligned down to 128 lanes
  strip256  = plane[ystart : ystart+band, xa : xa+256]  (dynamic slice)
  window    = roll(strip256, -(xmin - xa))[:, :128]     (lane roll)
  wx[k, p]  = hat(xmin + k - xs[p])                     (VPU, in VMEM)
  t1        = window @ wx: [band, 128] @ [128, P]       (MXU)
  out[p]    = sum_b hat(ystart + b - ys[p]) * t1[b, p]  (VPU reduce)

This reproduces exactly the two-tap zero-border bilinear of
ops/image.py:bilinear_sample whenever the block's source extent fits the
static windows:

  x: CW*|dx/du| + 8*|dx/dv| + 2 <= 126
  y: 8*|dy/dv| + CW*|dy/du| + 2 + 7 <= band

(derivative magnitudes = roi_scale*cos/sin terms).  With CW=32 that
admits ROI scales up to ~3.9x output size and rotations beyond +-0.4
rad at typical scales — far outside the cascade's operating envelope;
the XLA gather path remains the exact general fallback.  uint8 pixel
values are exact in bfloat16, so bf16 MXU dots only round the hat
weights (~2^-8 relative — at most one quantization level vs the
gather).

``warp_sample_multi`` samples SEVERAL same-width coordinate sets (e.g.
the left and right iris crops) in ONE pallas_call so the frame's planes
are fetched into VMEM once, not once per warp.  jax.vmap batches the
call by prepending a batch grid dimension.
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


def planes_fit_vmem(h: int, w: int, budget_bytes: int = 12 * 2**20
                    ) -> bool:
    """Whether three padded f32 planes fit the kernel VMEM residency
    (single source of truth for the pallas/gather gate)."""
    hp = -(-h // 8) * 8
    wp = max(-(-w // XWIN) * XWIN, XLOAD)
    return 3 * 4 * hp * wp <= budget_bytes


def pick_cw(scale_x: float) -> int:
    """Largest column-block width whose x-extent fits the 128-lane
    window: cw * scale_x + margin <= 126.  Returns 0 when even cw=16
    does not fit (caller should use the exact gather)."""
    for cw in (32, 16):
        if cw * scale_x + 10.0 <= 126.0:
            return cw
    return 0


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_kernel(r_ref, g_ref, b_ref, xs_ref, ys_ref, out_ref, *,
                 band, dot_bf16):
    """One row-tile of CB [ROW_TILE, cw] output blocks.

    r/g/b_ref: [Hp, Wp] f32 channel planes (padded);
    xs_ref/ys_ref: [1, CB, 1, PB] block-flattened coords;
    out_ref: [1, 3, CB, PB] f32.
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
        ys = ys_ref[0, cb]

        ymin = jnp.floor(jnp.min(ys)).astype(jnp.int32)
        ystart = jnp.clip((ymin // 8) * 8, 0, h - band)
        ystart = pl.multiple_of(ystart, 8)

        xmin = jnp.clip(jnp.floor(jnp.min(xs)).astype(jnp.int32),
                        0, w - 1)
        xa = jnp.clip((xmin // XWIN) * XWIN, 0, w - XLOAD)
        xa = pl.multiple_of(xa, XWIN)
        off = xmin - xa

        # tap validity (x < w) zeroes any tap beyond the true image
        # width, so when the xa clip binds and the roll wraps padded
        # columns onto real pixels the wrapped taps carry no weight —
        # the zero-border semantics survive without extra padding
        tap_x = iota_x + xmin.astype(jnp.float32)
        wx = _hat(tap_x - xs) * (tap_x < w).astype(jnp.float32)
        wy = _hat(iota_y + ystart.astype(jnp.float32) - ys)  # [band, PB]
        if dot_bf16:
            wx = wx.astype(jnp.bfloat16)

        for c, ref in enumerate((r_ref, g_ref, b_ref)):
            strip = ref[pl.ds(ystart, band), pl.ds(xa, XLOAD)]
            window = pltpu.roll(strip, -off, axis=1)[:, :XWIN]
            if dot_bf16:
                window = window.astype(jnp.bfloat16)
            t1 = jnp.dot(window, wx,
                         preferred_element_type=jnp.float32)
            out_ref[0, c, cb, :] = jnp.sum(wy * t1, axis=0)


def _blocked(a, ho, wo, cw):
    """[Ho, Wo] -> [T, CB, 1, PB] block-row-major coordinate layout."""
    t = ho // ROW_TILE
    cb = wo // cw
    return (a.reshape(t, ROW_TILE, cb, cw)
            .transpose(0, 2, 1, 3)
            .reshape(t, cb, 1, ROW_TILE * cw))


def make_planes(image_hwc: jnp.ndarray, band: int = 48):
    """Padded f32 channel planes for ``warp_sample_multi``: one fused
    pad+convert per channel.  Build ONCE per frame and share across
    every warp call of the frame (the tap-validity mask in the kernel
    works off the padded width, so planes carry no extra metadata)."""
    h, w, _ = image_hwc.shape
    hp = max(-(-h // 8) * 8, band)
    wp = max(-(-w // XWIN) * XWIN, XLOAD)
    return [jnp.pad(image_hwc[..., c].astype(jnp.float32),
                    ((0, hp - h), (0, wp - w))) for c in range(3)]


def warp_sample_multi(image_hwc, coords, band: int = 48,
                      dot_dtype=jnp.bfloat16, interpret: bool = False,
                      planes=None, cw: int = 32):
    """Bilinear-sample several same-width output grids from one frame
    in one pallas_call (single VMEM fetch of the planes).

    Args:
      image_hwc: [H, W, 3] float source frame (may be None when
        ``planes`` is given).
      coords: list of (src_x, src_y) pairs, each [Ho_i, Wo] with
        Ho_i % 8 == 0 and a SHARED Wo with Wo % 32 == 0 (each grid
        step runs a fixed CB-block loop, so widths must agree; use
        separate calls for different widths).
      band: static vertical source window (multiple of 8).
      dot_dtype: jnp.bfloat16 runs the MXU dots in bf16; None = f32.
      interpret: run in the Pallas interpreter (CPU testing).
      planes: optional pre-built ``make_planes`` output, shared across
        calls on the same frame.
      cw: output columns per block (32 or 16); smaller cw halves the
        per-block x-extent so larger ROI-to-output scales fit the
        128-lane window (see pick_cw).

    Returns: list of [Ho_i, Wo, 3] f32 sampled pixels.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU testing path
    shapes = []
    for src_x, _ in coords:
        ho, wo = src_x.shape
        assert ho % ROW_TILE == 0 and wo % cw == 0, (ho, wo)
        shapes.append((ho, wo))
    widths = {wo for _, wo in shapes}
    assert len(widths) == 1, f"segment widths must agree, got {widths}"
    cb = shapes[0][1] // cw
    pb = ROW_TILE * cw

    xs = jnp.concatenate([_blocked(sx, ho, wo, cw)
                          for (sx, _), (ho, wo) in zip(coords, shapes)])
    ys = jnp.concatenate([_blocked(sy, ho, wo, cw)
                          for (_, sy), (ho, wo) in zip(coords, shapes)])
    t_total = xs.shape[0]

    if planes is None:
        planes = make_planes(image_hwc, band)
    hp, wp = planes[0].shape
    band = min(band, hp)

    plane_spec = pl.BlockSpec((hp, wp), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    coord_spec = pl.BlockSpec((1, cb, 1, pb), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_warp_kernel, band=band,
                dot_bf16=dot_dtype == jnp.bfloat16),
        grid=(t_total,),
        in_specs=[plane_spec, plane_spec, plane_spec, coord_spec,
                  coord_spec],
        out_specs=pl.BlockSpec((1, 3, cb, pb), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, 3, cb, pb),
                                       jnp.float32),
        interpret=interpret,
    )(*planes, xs, ys)

    # split segments; [T, 3, CB, PB] -> [Ho, Wo, 3]
    results = []
    start = 0
    for ho, wo in shapes:
        t = ho // ROW_TILE
        seg = out[start:start + t]
        start += t
        results.append(seg.reshape(t, 3, cb, ROW_TILE, cw)
                       .transpose(0, 3, 2, 4, 1)
                       .reshape(ho, wo, 3))
    return results


def warp_sample(image_hwc: jnp.ndarray, src_x: jnp.ndarray,
                src_y: jnp.ndarray, band: int = 48,
                dot_dtype=jnp.bfloat16, interpret: bool = False,
                cw: int = 32) -> jnp.ndarray:
    """Single-grid convenience wrapper over ``warp_sample_multi``."""
    (out,) = warp_sample_multi(image_hwc, [(src_x, src_y)], band=band,
                               dot_dtype=dot_dtype, interpret=interpret,
                               cw=cw)
    return out

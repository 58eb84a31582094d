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

Two plane residency modes share the same per-block math:

* resident  — the three padded f32 planes live in VMEM for the whole
  call (zero per-block fetch cost).  Used when they fit the ~12 MB
  budget (<= ~720p frames).
* strips    — the planes stay in HBM (``pl.ANY``) and every block
  double-buffer-DMAs only its [band, 256] source strip into VMEM
  scratch, so frame size no longer bounds the kernel (1080p, 4K, ...).
  Per-block traffic is band*256*4 B/channel; the DMA of block k+1
  overlaps the compute of block k.
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


def plane_y_align(dtype) -> int:
    """Strip-start sublane alignment for a plane dtype — bf16 planes
    pack 16-row sublane tiles (and add up to 15 rows of start slack to
    a band), f32 planes 8.  The ONE definition of the 8/16 rule."""
    return 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8


def padded_width(w: int) -> int:
    """Padded plane width (lanes) ``make_planes`` allocates for an
    image of width ``w`` — the ONE definition of the kernel's plane
    width padding rule; every dispatch site that budgets x-windows
    against the plane (pipeline._warp_cfg, image.choose_warp_method)
    must use it instead of re-deriving the formula."""
    return max(-(-w // XWIN) * XWIN, XLOAD)


def planes_fit_vmem(h: int, w: int, budget_bytes: int = 12 * 2**20,
                    itemsize: int = 4) -> bool:
    """Whether three padded planes fit the kernel VMEM residency
    (single source of truth for the pallas/gather gate); bf16 planes
    (itemsize 2) fit twice the area."""
    hp = -(-h // 8) * 8
    return 3 * itemsize * hp * padded_width(w) <= budget_bytes


def pick_cw(scale_x: float, sin_max: float = 0.5) -> int:
    """Largest column-block width whose x-extent fits the 128-lane
    window: cw*scale_x + 8*scale_x*sin_max + 2 <= 126 (the shear term
    8*|dx/dv| is bounded by the worst-case rotation ``sin_max``, default
    0.5 = 30 degrees — beyond any ROI the cascade derives).  Returns 0
    when even cw=16 does not fit (caller should use the exact gather).
    Per-ROI truth is checked dynamically by ``envelope_ok``."""
    for cw in (32, 16):
        if (cw + 8.0 * sin_max) * scale_x + 2.0 <= 126.0:
            return cw
    return 0


def extents_host(roi_abs, out_size, keep_aspect_ratio: bool, cw: int,
                 rt: int = ROW_TILE):
    """Host-side per-block source extents (x_ext, y_ext_base) of one
    concrete ROI — y_ext_base excludes the strip-start alignment slack
    (add ``y_align - 1``).  The derivative algebra is the SHARED
    ``image.warp_derivatives`` (xp=numpy), the same letterbox math the
    traced sampling grid is built from — it cannot drift."""
    from . import image as image_ops

    roi = np.asarray(roi_abs, np.float64)
    dxdu, dxdv, dydu, dydv = image_ops.warp_derivatives(
        roi, out_size, keep_aspect_ratio, xp=np)
    x_ext = cw * dxdu + rt * dxdv + 2.0
    y_ext = rt * dydv + cw * dydu + 2.0
    return float(x_ext), float(y_ext)


def envelope_ok_host(roi_abs, out_size, keep_aspect_ratio: bool,
                     cw: int, band: int, y_align: int = 8,
                     x_budget: int = XWIN - 2) -> bool:
    """Host-side (concrete numpy) ``envelope_ok`` for the standalone
    models, whose ROI values are known before dispatch."""
    x_ext, y_ext = extents_host(roi_abs, out_size, keep_aspect_ratio,
                                cw)
    return bool(x_ext <= x_budget and y_ext + (y_align - 1) <= band)


def envelope_ok(src_x, src_y, cw: int, band: int, y_align: int = 8,
                x_budget: int = XWIN - 2, rt: int = ROW_TILE):
    """Traced per-warp check that a coordinate grid fits the kernel's
    static windows (the docstring's x/y extent constraints).

    The block-local source extents are affine in the output grid, so the
    global derivatives |dx/du|, |dx/dv|, |dy/du|, |dy/dv| measured from
    the grid's first row/column bound every block.  ``y_align`` is the
    strip-start alignment (8 for f32 planes, 16 for bf16), whose
    down-rounding adds up to y_align-1 rows of slack the band must
    absorb.  ``x_budget`` is the per-block x-extent the window admits:
    ``XWIN - 2`` for the rolled window, ``xload - 129`` for the wide
    roll-free window (xa is 128-aligned at or below xmin, so at least
    ``xload - 127`` taps from xmin are always loaded).  Returns a
    traced bool; False means some taps would clamp (callers surface it
    as a validity flag — a jitted program cannot fall back)."""
    dxdu = jnp.abs(src_x[0, 1] - src_x[0, 0])
    dxdv = jnp.abs(src_x[1, 0] - src_x[0, 0])
    dydu = jnp.abs(src_y[0, 1] - src_y[0, 0])
    dydv = jnp.abs(src_y[1, 0] - src_y[0, 0])
    x_ext = cw * dxdu + rt * dxdv + 2.0
    y_ext = rt * dydv + cw * dydu + 2.0 + (y_align - 1)
    return (x_ext <= float(x_budget)) & (y_ext <= band)


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _block_geometry(xs, ys, h, w, band, y_align=8, xload=XLOAD):
    """Aligned source-strip origin for one output block: sublane-tile-
    aligned row start (8 rows for f32 planes, 16 for bf16), 128-aligned
    column start, and the lane roll offset."""
    ymin = jnp.floor(jnp.min(ys)).astype(jnp.int32)
    ystart = jnp.clip((ymin // y_align) * y_align, 0, h - band)
    ystart = pl.multiple_of(ystart, y_align)
    xmin = jnp.clip(jnp.floor(jnp.min(xs)).astype(jnp.int32), 0, w - 1)
    xa = jnp.clip((xmin // XWIN) * XWIN, 0, w - xload)
    xa = pl.multiple_of(xa, XWIN)
    return ystart, xa, xmin - xa, xmin


def _block_weights(xs, ys, xbase, ystart, iota_x, iota_y, w, dot_bf16):
    """Hat weight matrices for one block (``xbase`` = first tap column:
    ``xmin`` for the rolled 128-lane window, ``xa`` for the wide
    roll-free window).

    tap validity (x < w) zeroes any tap beyond the true image width, so
    when the xa clip binds and the roll wraps padded columns onto real
    pixels the wrapped taps carry no weight — the zero-border semantics
    survive without extra padding."""
    tap_x = iota_x + xbase.astype(jnp.float32)
    wx = _hat(tap_x - xs) * (tap_x < w).astype(jnp.float32)
    wy = _hat(iota_y + ystart.astype(jnp.float32) - ys)  # [band, PB]
    if dot_bf16:
        wx = wx.astype(jnp.bfloat16)
    return wx, wy


def _block_dot(window, wx, wy, dot_bf16):
    """[band, XWIN] window x [XWIN, PB] hat weights on the MXU, then the
    VPU y-reduction."""
    if dot_bf16:
        window = window.astype(jnp.bfloat16)
    t1 = jnp.dot(window, wx, preferred_element_type=jnp.float32)
    return jnp.sum(wy * t1, axis=0)


def _warp_kernel(r_ref, g_ref, b_ref, xs_ref, ys_ref, out_ref, *,
                 band, dot_bf16, wide, xload=XLOAD):
    """One row-tile of CB [ROW_TILE, cw] output blocks, planes resident.

    r/g/b_ref: [Hp, Wp] f32 channel planes (padded, whole-call VMEM);
    xs_ref/ys_ref: [1, CB, 1, PB] block-flattened coords;
    out_ref: [1, 3, CB, PB] f32.

    ``wide`` selects the x-window strategy: False lane-rolls each
    channel strip to a 128-lane window starting at xmin (small hat
    matrices, 3 VPU rolls per block); True skips the rolls and builds
    hat weights over the full 256-lane aligned load (2x the hat build
    and MXU work, zero roll traffic).  Measured on v5e the rolls WIN
    (mesh warp 6.32 vs 6.74 ms at batch 128, tools/tpu_wide_probe.py),
    so False stays the default; wide mode also admits ~2x larger
    x-extents, which a caller may someday want more than the ~6%.
    """
    h = r_ref.shape[0]
    w = r_ref.shape[1]
    cb_count = xs_ref.shape[1]
    pb = xs_ref.shape[3]
    # bf16 planes need 16-row sublane-tile alignment and have no
    # 32-bit lane rotate, so they require the roll-free wide window
    y_align = plane_y_align(r_ref.dtype)
    assert wide or y_align == 8, "bf16 planes require wide mode"
    assert wide or xload == XLOAD, "custom xload requires wide mode"

    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (xload if wide else XWIN, pb), 0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (band, pb), 0
                                      ).astype(jnp.float32)

    for cb in range(cb_count):
        xs = xs_ref[0, cb]                                # [1, PB]
        ys = ys_ref[0, cb]
        ystart, xa, off, xmin = _block_geometry(xs, ys, h, w, band,
                                                y_align, xload)
        wx, wy = _block_weights(xs, ys, xa if wide else xmin, ystart,
                                iota_x, iota_y, w, dot_bf16)
        for c, ref in enumerate((r_ref, g_ref, b_ref)):
            strip = ref[pl.ds(ystart, band), pl.ds(xa, xload)]
            window = (strip if wide
                      else pltpu.roll(strip, -off, axis=1)[:, :XWIN])
            out_ref[0, c, cb, :] = _block_dot(window, wx, wy, dot_bf16)


def _warp_kernel_strips(planes_ref, xs_ref, ys_ref, out_ref,
                        strip_ref, sem_ref, *, band, dot_bf16,
                        plane_ratio, wide, xload=XLOAD):
    """The same row-tile program with HBM-resident planes: each block
    DMAs only its [band, XLOAD] source strip into a double-buffered
    VMEM scratch, so arbitrarily large frames never have to fit VMEM.

    planes_ref: [GP, 3, Hp, Wp] f32 stacked planes in HBM
    (``pl.ANY`` — Pallas TPU only allows ANY refs with a trivial
    index map, so batching is a GRID dimension, not a blocked ref; the
    grid's group axis g maps to plane set g // plane_ratio);
    xs_ref/ys_ref: [1, 1, CB, 1, PB]; out_ref: [1, 1, 3, CB, PB];
    strip_ref: [2, 3, band, XLOAD] VMEM scratch; sem_ref: [2] DMA.

    All three channel strips move as ONE strided [3, band, xload] copy
    per block (one DMA issue + one semaphore wait instead of three):
    measured 8.5% faster on the 1080p strips config, bit-exact
    (tools/tpu_strip_dma_probe.py).
    """
    h = planes_ref.shape[2]
    w = planes_ref.shape[3]
    cb_count = xs_ref.shape[2]
    pb = xs_ref.shape[4]
    b = pl.program_id(0) // plane_ratio
    y_align = plane_y_align(planes_ref.dtype)
    assert wide or y_align == 8, "bf16 planes require wide mode"
    assert wide or xload == XLOAD, "custom xload requires wide mode"

    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (xload if wide else XWIN, pb), 0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (band, pb), 0
                                      ).astype(jnp.float32)

    # per-block geometry is cheap scalar math; compute it up front so
    # block k+1's DMAs can issue before block k's compute
    geom = []
    for cb in range(cb_count):
        geom.append(_block_geometry(xs_ref[0, 0, cb], ys_ref[0, 0, cb],
                                    h, w, band, y_align, xload))

    def _dma(cb, slot):
        ystart, xa, _, _ = geom[cb]
        return pltpu.make_async_copy(
            planes_ref.at[b, :, pl.ds(ystart, band), pl.ds(xa, xload)],
            strip_ref.at[slot],
            sem_ref.at[slot])

    _dma(0, 0).start()

    for cb in range(cb_count):
        slot = cb % 2
        if cb + 1 < cb_count:
            _dma(cb + 1, (cb + 1) % 2).start()
        xs = xs_ref[0, 0, cb]
        ys = ys_ref[0, 0, cb]
        ystart, xa, off, xmin = geom[cb]
        wx, wy = _block_weights(xs, ys, xa if wide else xmin, ystart,
                                iota_x, iota_y, w, dot_bf16)
        _dma(cb, slot).wait()
        for c in range(3):
            window = (strip_ref[slot, c] if wide
                      else pltpu.roll(strip_ref[slot, c], -off,
                                      axis=1)[:, :XWIN])
            out_ref[0, 0, c, cb, :] = _block_dot(window, wx, wy,
                                                 dot_bf16)


_STRIPS_FNS = {}


def _get_strips_fn(band: int, dot_bf16: bool, interpret: bool,
                   wide: bool, plane_dtype=jnp.float32,
                   xload: int = XLOAD):
    """Cached ``jax.custom_vmap`` wrapper around the strip-DMA
    pallas_call.

    vmap cannot batch an ANY-memspace ref (Mosaic requires its block =
    whole array with a trivial index map), so the custom batching rule
    FLATTENS every vmap level into the leading "group" grid axis:
    planes [GP, 3, Hp, Wp] + coords [GC, T, CB, 1, PB] with GP | GC;
    group g reads plane set g // (GC/GP).  Nested vmaps (faces inside
    batch) flatten consistently because coords and planes grow by the
    same leading factor whenever both are batched, and only GP == 1
    levels (shared frame planes across faces) are ever unbatched."""
    key = (band, dot_bf16, interpret, wide, jnp.dtype(plane_dtype).name,
           xload)
    if key in _STRIPS_FNS:
        return _STRIPS_FNS[key]

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fn(planes, xs, ys):
        gp = planes.shape[0]
        gc, t, cb, _, pb = xs.shape
        assert gc % gp == 0, (gc, gp)
        coord_spec = pl.BlockSpec((1, 1, cb, 1, pb),
                                  lambda g, i: (g, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_warp_kernel_strips, band=band, dot_bf16=dot_bf16,
                    plane_ratio=gc // gp, wide=wide, xload=xload),
            grid=(gc, t),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), coord_spec,
                      coord_spec],
            out_specs=pl.BlockSpec((1, 1, 3, cb, pb),
                                   lambda g, i: (g, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gc, t, 3, cb, pb),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 3, band, xload),
                                       plane_dtype),
                            pltpu.SemaphoreType.DMA((2,))],
            interpret=interpret,
        )(planes, xs, ys)

    @fn.def_vmap
    def _rule(axis_size, in_batched, planes, xs, ys):
        planes_b, xs_b, ys_b = in_batched
        assert xs_b and ys_b, "coordinate grids must be batched"

        def flat(a):
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

        if planes_b:
            planes = flat(planes)
        else:
            # shared planes across this axis (e.g. faces of one frame)
            # only compose when GP == 1, which is the only way an
            # unbatched-planes level arises in the cascade
            assert planes.shape[0] == 1, planes.shape
        out = fn(planes, flat(xs), flat(ys))
        return (out.reshape((axis_size, out.shape[0] // axis_size)
                            + out.shape[1:]), True)

    _STRIPS_FNS[key] = fn
    return fn


def _blocked(a, ho, wo, cw, rt=ROW_TILE):
    """[Ho, Wo] -> [T, CB, 1, PB] block-row-major coordinate layout."""
    t = ho // rt
    cb = wo // cw
    return (a.reshape(t, rt, cb, cw)
            .transpose(0, 2, 1, 3)
            .reshape(t, cb, 1, rt * cw))


def make_planes(image_hwc, band: int = 48, dtype=jnp.float32,
                layout: str = "hwc"):
    """Padded channel planes for ``warp_sample_multi``: one fused
    pad+convert per channel.  Build ONCE per frame and share across
    every warp call of the frame (the tap-validity mask in the kernel
    works off the padded width, so planes carry no extra metadata).

    ``dtype=jnp.bfloat16`` halves the planes' VMEM/DMA footprint at
    zero pixel precision loss (uint8 values are exact in bf16); bf16
    planes require the kernel's roll-free wide mode (Mosaic's lane
    rotate is 32-bit only) — ``warp_sample_multi`` switches to it
    automatically.

    ``layout="planar"`` takes an ALREADY channel-major [3, H, W] frame
    (e.g. from ``native_loader.decode_jpeg_batch(planar=True)``), so
    the build is a pure pad+convert with no device-side deinterleave —
    the layout the host decoder emits for free.

    Returns a LIST of three [Hp, Wp] planes when they fit the VMEM
    residency budget (the resident kernel wants separate 2D refs), or
    one stacked [3, Hp, Wp] array for the HBM strip-DMA kernel on
    larger frames — ``warp_sample_multi`` dispatches on the type."""
    if layout == "planar":
        _, h, w = image_hwc.shape
    else:
        h, w, _ = image_hwc.shape
    y_align = plane_y_align(dtype)
    hp = max(-(-h // y_align) * y_align,
             -(-band // y_align) * y_align)
    wp = padded_width(w)
    # Residency is gated at f32 size for EVERY dtype: a 12.5 MB bf16
    # resident plane set (1080p) fails Mosaic compilation even though
    # it passes the nominal 12 MB budget — bf16's win is the halved
    # strip DMA on large frames, not a stretched residency envelope.
    if layout == "planar":
        if planes_fit_vmem(hp, wp):
            return [jnp.pad(image_hwc[c].astype(dtype),
                            ((0, hp - h), (0, wp - w)))
                    for c in range(3)]
        return jnp.pad(image_hwc.astype(dtype),
                       ((0, 0), (0, hp - h), (0, wp - w)))
    if planes_fit_vmem(hp, wp):
        return [jnp.pad(image_hwc[..., c].astype(dtype),
                        ((0, hp - h), (0, wp - w))) for c in range(3)]
    # pad/transpose in f32 and cast last: the u8->bf16 pad+transpose
    # lowers ~2x slower than the f32 one (tools/tpu_1080p_probe.py)
    return jnp.pad(image_hwc.astype(jnp.float32).transpose(2, 0, 1),
                   ((0, 0), (0, hp - h), (0, wp - w))).astype(dtype)


def warp_sample_multi(image_hwc, coords, band: int = 48,
                      dot_dtype=jnp.bfloat16, interpret: bool = False,
                      planes=None, cw: int = 32, wide: bool = False,
                      xload: int = XLOAD, rt: int = ROW_TILE):
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
      wide: True skips the per-channel lane roll and builds hat weights
        over the full ``xload``-lane aligned load instead (2x hat-build
        and MXU work at xload 256, zero roll) — same output, different
        VPU/MXU trade.
      xload: aligned source-strip width in lanes (wide mode only; 128
        multiple).  Raising it beyond 256 widens the per-block x-extent
        envelope to ``xload - 129`` lanes — huge frames (4K) need 512
        so close-up faces keep the fast path (see envelope_ok).

    Returns: list of [Ho_i, Wo, 3] f32 sampled pixels.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU testing path
    shapes = []
    for src_x, _ in coords:
        ho, wo = src_x.shape
        assert ho % rt == 0 and wo % cw == 0, (ho, wo, rt)
        shapes.append((ho, wo))
    widths = {wo for _, wo in shapes}
    assert len(widths) == 1, f"segment widths must agree, got {widths}"
    cb = shapes[0][1] // cw
    pb = rt * cw

    xs = jnp.concatenate([_blocked(sx, ho, wo, cw, rt)
                          for (sx, _), (ho, wo) in zip(coords, shapes)])
    ys = jnp.concatenate([_blocked(sy, ho, wo, cw, rt)
                          for (_, sy), (ho, wo) in zip(coords, shapes)])
    t_total = xs.shape[0]

    if planes is None:
        planes = make_planes(image_hwc, band)
    # plane residency: a LIST of 2D planes = VMEM-resident kernel; one
    # stacked [3, Hp, Wp] array = HBM strip-DMA kernel (large frames).
    resident = isinstance(planes, (list, tuple))
    hp, wp = (planes[0].shape if resident else planes.shape[1:])
    band = min(band, hp)
    dot_bf16 = dot_dtype == jnp.bfloat16
    plane_dtype = (planes[0] if resident else planes).dtype
    if plane_dtype == jnp.bfloat16:
        # bf16 planes: no 32-bit lane rotate -> wide mode; 16-row
        # sublane tiles -> band on a 16 boundary
        assert dot_bf16, "bf16 planes require bf16 dots"
        wide = True
        band = min(-(-band // 16) * 16, hp)
    if xload != XLOAD:
        assert xload % XWIN == 0, xload
        wide = True                 # the roll path is 256-lane only
    xload = min(xload, wp)          # slices must fit the padded plane

    if resident:
        coord_spec = pl.BlockSpec((1, cb, 1, pb),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        plane_spec = pl.BlockSpec((hp, wp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_warp_kernel, band=band, dot_bf16=dot_bf16,
                    wide=wide, xload=xload),
            grid=(t_total,),
            in_specs=[plane_spec, plane_spec, plane_spec, coord_spec,
                      coord_spec],
            out_specs=pl.BlockSpec((1, 3, cb, pb),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_total, 3, cb, pb),
                                           jnp.float32),
            interpret=interpret,
        )(*planes, xs, ys)
    else:
        fn = _get_strips_fn(band, dot_bf16, interpret, wide,
                            plane_dtype, xload)
        out = fn(planes[None], xs[None], ys[None])[0]

    # split segments; [T, 3, CB, PB] -> [Ho, Wo, 3]
    results = []
    start = 0
    for ho, wo in shapes:
        t = ho // rt
        seg = out[start:start + t]
        start += t
        results.append(seg.reshape(t, 3, cb, rt, cw)
                       .transpose(0, 3, 2, 4, 1)
                       .reshape(ho, wo, 3))
    return results


def warp_sample(image_hwc: jnp.ndarray, src_x: jnp.ndarray,
                src_y: jnp.ndarray, band: int = 48,
                dot_dtype=jnp.bfloat16, interpret: bool = False,
                cw: int = 32, xload: int = XLOAD, rt: int = ROW_TILE
                ) -> jnp.ndarray:
    """Single-grid convenience wrapper over ``warp_sample_multi``."""
    (out,) = warp_sample_multi(image_hwc, [(src_x, src_y)], band=band,
                               dot_dtype=dot_dtype, interpret=interpret,
                               cw=cw, xload=xload, rt=rt)
    return out

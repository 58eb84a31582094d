"""Fused on-device image preprocessing.

TPU-native replacement for the reference's ``image_to_tensor``
(reference: transform.rs:188-309), which chains OpenCV
``warp_perspective`` -> ``copy_make_border`` -> ``resize`` -> ``resize`` ->
per-pixel normalize on the host.  All four resampling stages compose into a
single affine map (a rotated rect warped to a rect is affine, and bilinear
resizes are affine coordinate maps), so the whole chain collapses to ONE
bilinear gather from the source image, with the range normalization fused
into the same elementwise epilogue.  Letterbox padding is computed as pure
math and never materialized (the pad region maps outside the source image
and reads zeros through the zero-border gather).

The letterbox padding math keeps the reference's exact semantics, including
the integer-division aspect quirk (transform.rs:240) and the int-truncated
pad sizes (transform.rs:253), because the padding fractions feed coordinate
un-mapping downstream.

All functions are shape-static and jit/vmap-friendly: ROI parameters and
the flip flag are traced values; image size, output size and mode flags are
static.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
                    ) -> jnp.ndarray:
    """Bilinear sample with constant-zero border.

    image: [H, W, C] float; xs/ys: [Ho, Wo] source pixel coordinates.
    Returns [Ho, Wo, C].
    """
    h, w = image.shape[0], image.shape[1]
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    dx = (xs - x0f)[..., None]
    dy = (ys - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = image.reshape(h * w, -1)

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, lin.reshape(-1), axis=0)
        vals = vals.reshape(xs.shape + (flat.shape[-1],))
        return vals * valid[..., None]

    top = tap(y0, x0) * (1 - dx) + tap(y0, x0 + 1) * dx
    bot = tap(y0 + 1, x0) * (1 - dx) + tap(y0 + 1, x0 + 1) * dx
    return top * (1 - dy) + bot * dy


def letterbox_padding(roi_w, roi_h, out_size: Tuple[int, int], xp=jnp):
    """Letterbox padding fractions + effective pixel pads.

    Reference semantics transform.rs:236-257: returns
    (pad_x, pad_y, ph, pv) where pad_x/pad_y are the normalized padding
    fractions reported to the caller and ph/pv the integer pixel pads
    actually applied before the final resize.

    ``xp`` selects the array module: jnp for the traced sampling path,
    numpy for host-side concrete dispatch (choose_warp_method /
    pallas_warp.extents_host) — ONE derivation of the quirky letterbox
    algebra for both worlds.
    """
    # Integer-division quirk kept from transform.rs:240 (square outputs
    # only are exercised; aspect == 1).
    out_aspect = float(out_size[1] // out_size[0])
    roi_aspect = roi_h / roi_w
    w_i = xp.trunc(roi_w)
    h_i = xp.trunc(roi_h)

    cond = xp.asarray(out_aspect > roi_aspect)
    pad_y = xp.where(cond, (1.0 - roi_aspect / out_aspect) / 2.0, 0.0)
    pad_x = xp.where(cond, 0.0, (1.0 - out_aspect / roi_aspect) / 2.0)
    new_h = xp.where(cond, xp.trunc(roi_w * out_aspect), h_i)
    new_w = xp.where(cond, w_i, xp.trunc(roi_h / out_aspect))

    changed = (new_w != w_i) | (new_h != h_i)
    # Pixel pads = trunc(pad_fraction * new_dim).  The reference computes
    # this in f64 (transform.rs:253) where integer-valued ROI dims land
    # exactly on the integer (e.g. 540x360 -> pad_v = 90.0).  In f32 the
    # ratio-first form rounds to 89.99999 -> trunc 89, shifting the whole
    # sampling grid; multiply-before-divide keeps integer-valued dims
    # exact (products < 2^24 are representable).
    pv_exact = (new_h - (new_h * roi_h) / (roi_w * out_aspect)) / 2.0
    ph_exact = (new_w - (new_w * out_aspect * roi_w) / roi_h) / 2.0
    ph = xp.where(changed & xp.logical_not(cond),
                  xp.trunc(ph_exact), 0.0)
    pv = xp.where(changed & cond, xp.trunc(pv_exact), 0.0)
    return pad_x, pad_y, ph, pv


def letterbox_two_stage_params(image_size: Tuple[int, int],
                               out_size: Tuple[int, int]):
    """Whether the reference's double-resize letterbox differs from the
    fused single resample for a WHOLE-IMAGE ROI at this geometry.

    The reference letterboxes in two materialized resizes
    (transform.rs:252-280): pad by the int-truncated pixel pads, resize
    to (new_w, new_h), resize to out_size.  The single fused map is
    bit-exact whenever the padded size equals the first resize target
    (then resize1 is identity — every landscape/square case in
    practice); when int truncation breaks that (e.g. 200x225 portrait:
    padded 224 wide, resize target 225), resize1 resamples and the
    intermediate blur is observable in detector outputs.  Returns None
    when the fused map is exact, else the static intermediate geometry
    ``(new_w, new_h, ph, pv, pad_x, pad_y)`` for
    ``letterbox_two_stage``.  Host-side, static ints only.
    """
    w, h = int(image_size[0]), int(image_size[1])
    out_aspect = float(out_size[1] // out_size[0])  # transform.rs:240
    roi_aspect = h / w
    if out_aspect > roi_aspect:
        new_w, new_h = w, int(w * out_aspect)
        pad_x, pad_y = 0.0, (1.0 - roi_aspect / out_aspect) / 2.0
    else:
        new_w, new_h = int(h / out_aspect), h
        pad_x, pad_y = (1.0 - out_aspect / roi_aspect) / 2.0, 0.0
    if (new_w, new_h) == (w, h):
        return None                      # no letterbox stage at all
    ph, pv = int(pad_x * new_w), int(pad_y * new_h)
    if (w + 2 * ph, h + 2 * pv) == (new_w, new_h):
        return None                      # resize1 is identity -> fused
    return (new_w, new_h, ph, pv, pad_x, pad_y)


def letterbox_two_stage(source, image_size: Tuple[int, int],
                        out_size: Tuple[int, int], params,
                        output_range: Tuple[float, float],
                        planar: bool = False, precision=None):
    """Exact reference double-resize letterbox for the whole-image ROI
    (transform.rs:252-280), including the intermediate uint8 Mat
    quantization between the two resizes.  Only reached when
    ``letterbox_two_stage_params`` reports the fused single map is
    inexact; both resizes are separable hat matmuls (MXU-friendly),
    stage 1 at the ~source-sized intermediate geometry.

    ``source``: [H, W, 3] f32 image, or padded channel planes with
    ``planar=True`` (their zero padding reproduces the zero border).
    Returns (tensor [Ho, Wo, 3] f32, padding (4,) f32)."""
    w, h = int(image_size[0]), int(image_size[1])
    wo, ho = out_size
    new_w, new_h, ph, pv, pad_x, pad_y = params

    # stage 1: copy_make_border + resize to (new_w, new_h); the pad
    # composes into the coordinate map (outside-source taps read the
    # zero border)
    x1 = ((jnp.arange(new_w, dtype=jnp.float32) + 0.5)
          * (w + 2 * ph) / new_w - 0.5 - ph)
    y1 = ((jnp.arange(new_h, dtype=jnp.float32) + 0.5)
          * (h + 2 * pv) / new_h - 0.5 - pv)
    sx = jnp.broadcast_to(x1[None, :], (new_h, new_w))
    sy = jnp.broadcast_to(y1[:, None], (new_h, new_w))
    if planar:
        sample = separable_sample_planar
    else:
        sample = separable_sample
        source = source.astype(jnp.float32)
    mid = jnp.rint(sample(source, sx, sy, precision=precision))

    # stage 2: resize to out_size over the uint8-quantized intermediate
    x2 = (jnp.arange(wo, dtype=jnp.float32) + 0.5) * new_w / wo - 0.5
    y2 = (jnp.arange(ho, dtype=jnp.float32) + 0.5) * new_h / ho - 0.5
    sx2 = jnp.broadcast_to(x2[None, :], (ho, wo))
    sy2 = jnp.broadcast_to(y2[:, None], (ho, wo))
    out = separable_sample(mid, sx2, sy2, precision=precision)
    padding = jnp.asarray([pad_x, pad_y, pad_x, pad_y], jnp.float32)
    return _normalize_pixels(out, output_range, True), padding


def warp_derivatives(roi_abs, out_size: Tuple[int, int],
                     keep_aspect_ratio: bool, xp=jnp):
    """|d src / d out| magnitudes (dxdu, dxdv, dydu, dydv) of the
    ``image_to_tensor`` warp map.

    Derived from the SAME letterbox algebra the sampling grid uses
    (``letterbox_padding``; the per-output-pixel normalized steps match
    ``_source_coords``' (w_i + 2 ph)/wo grid spacing divided by w_i),
    so the host-side Pallas envelope dispatch
    (``pallas_warp.extents_host``, xp=numpy) can never drift from the
    traced coordinates — the duplication a round-2 review flagged.
    """
    cx, cy, rw, rh, rot = (roi_abs[0], roi_abs[1], roi_abs[2],
                           roi_abs[3], roi_abs[4])
    wo, ho = out_size
    if keep_aspect_ratio:
        _, _, ph, pv = letterbox_padding(rw, rh, out_size, xp=xp)
        w_i = xp.trunc(rw)
        h_i = xp.trunc(rh)
        qx_u = (w_i + 2.0 * ph) / (wo * xp.maximum(w_i, 1.0))
        qy_v = (h_i + 2.0 * pv) / (ho * xp.maximum(h_i, 1.0))
    else:
        qx_u = 1.0 / wo
        qy_v = 1.0 / ho
    s, c = xp.sin(rot), xp.cos(rot)
    # src = c0 + qx*(rw*c, rw*s) + qy*(-rh*s, rh*c)  (see _source_coords)
    return (xp.abs(qx_u * rw * c), xp.abs(qy_v * rh * s),
            xp.abs(qx_u * rw * s), xp.abs(qy_v * rh * c))


def _source_coords(roi_abs: jnp.ndarray, out_size: Tuple[int, int],
                   keep_aspect_ratio: bool, flip_horizontal):
    """Source sampling coordinates for the ``image_to_tensor`` warp.

    Returns (src_x [Ho,Wo], src_y [Ho,Wo], padding (4,)).  Shared by the
    gather and MXU sampling backends.
    """
    wo, ho = out_size
    cx, cy, rw, rh, rot = (roi_abs[0], roi_abs[1], roi_abs[2], roi_abs[3],
                           roi_abs[4])

    # Output pixel grid (optionally mirrored).
    u = jnp.arange(wo, dtype=jnp.float32)[None, :].repeat(ho, axis=0)
    v = jnp.arange(ho, dtype=jnp.float32)[:, None].repeat(wo, axis=1)
    flip = jnp.asarray(flip_horizontal)
    u = jnp.where(flip, (wo - 1) - u, u)

    if keep_aspect_ratio:
        # Compose resize2^-1 . resize1^-1 . unpad: the intermediate
        # (new_w, new_h) target cancels out of the half-pixel algebra.
        pad_x, pad_y, ph, pv = letterbox_padding(rw, rh, out_size)
        w_i = jnp.trunc(rw)
        h_i = jnp.trunc(rh)
        x0 = (u + 0.5) * (w_i + 2.0 * ph) / wo - 0.5 - ph
        y0 = (v + 0.5) * (h_i + 2.0 * pv) / ho - 0.5 - pv
        qx = x0 / w_i
        qy = y0 / h_i
        padding = jnp.stack([pad_x, pad_y, pad_x, pad_y])
    else:
        # Direct warp: OpenCV warp_perspective samples dst integer coords.
        qx = u / wo
        qy = v / ho
        padding = jnp.zeros(4, dtype=jnp.float32)

    # Rotated-rect corners (reference types.rs:80-96); the perspective
    # transform of a parallelogram quad is exactly affine.
    s, c = jnp.sin(rot), jnp.cos(rot)
    hw, hh = rw / 2.0, rh / 2.0
    c0x, c0y = cx + (-hw) * c - (-hh) * s, cy + (-hw) * s + (-hh) * c
    c1x, c1y = cx + hw * c - (-hh) * s, cy + hw * s + (-hh) * c
    c3x, c3y = cx + (-hw) * c - hh * s, cy + (-hw) * s + hh * c

    src_x = c0x + qx * (c1x - c0x) + qy * (c3x - c0x)
    src_y = c0y + qx * (c1y - c0y) + qy * (c3y - c0y)
    return src_x, src_y, padding


def _normalize_pixels(out, output_range: Tuple[float, float],
                      quantize_uint8: bool):
    if quantize_uint8:
        # The reference chain materializes uint8 Mats between stages
        # (OpenCV warp/resize on 8-bit images round-to-even each pixel,
        # transform.rs:226-279); emulate the final quantization so the
        # normalized tensor is bit-comparable.
        out = jnp.rint(out)
    lo, hi = output_range
    return out * ((hi - lo) / 255.0) + lo


def _hat(t: jnp.ndarray) -> jnp.ndarray:
    """Bilinear hat weights: B(k - s) = max(0, 1 - |k - s|).  A row of
    hat weights over integer taps k reproduces exactly the two-tap
    zero-border bilinear gather at coordinate s."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def mxu_sample(image: jnp.ndarray, src_x: jnp.ndarray, src_y: jnp.ndarray,
               band: int = 32, row_tile: int = 8,
               precision=None) -> jnp.ndarray:
    """Bilinear sample as banded hat-weight matmuls (MXU path).

    TPU lowers per-pixel gathers to serialized row loads (~0.2 GB/s
    effective); this formulation replaces the gather with dense matmuls
    against sparse-in-structure hat-weight matrices, which the MXU eats:

      out[p, c] = sum_y B(y - ys[p]) * sum_x B(x - xs[p]) * img[y, x, c]

    The y-sum touches only rows [floor(min ys), floor(max ys)+1] of the
    source per tile of ``row_tile`` output rows, so each tile slices a
    ``band``-row strip (dynamic_slice = contiguous DMA, no gather) and
    contracts over the full width on the MXU.

    ``band`` bounds the vertical source extent of ``row_tile`` output
    rows: row_tile * roi_h / Ho * cos + roi_w * |sin| + 2.  ROIs beyond
    it (extreme rotation + extreme scale) clamp to the band edge —
    callers pick ``band`` for their envelope; the gather path remains
    the exact general fallback.

    image: [H, W, C] f32; src_x/src_y: [Ho, Wo].  Returns [Ho, Wo, C].
    """
    h, w, c = image.shape
    ho, wo = src_x.shape
    assert ho % row_tile == 0, (ho, row_tile)
    n_tiles = ho // row_tile
    p = row_tile * wo

    xs = src_x.reshape(n_tiles, p)
    ys = src_y.reshape(n_tiles, p)
    # per-tile band start: cover floor(min ys) .. floor(max ys)+1
    starts = jnp.clip(jnp.floor(jnp.min(ys, axis=1)).astype(jnp.int32),
                      0, max(h - band, 0))

    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(band, dtype=jnp.float32)

    def tile(carry, args):
        xs_t, ys_t, start = args
        strip = jax.lax.dynamic_slice(
            image, (start, 0, 0), (min(band, h), w, c))
        wx = _hat(cols[None, :] - xs_t[:, None])            # [P, W]
        # contract over x on the MXU: [P, W] @ [W, band*C]
        t1 = jnp.dot(wx, strip.transpose(1, 0, 2).reshape(w, -1),
                     precision=precision)                    # [P, band*C]
        wy = _hat(rows[None, :] - (ys_t[:, None]
                                   - start.astype(jnp.float32)))
        out = jnp.einsum("pb,pbc->pc",
                         wy[:, :min(band, h)],
                         t1.reshape(p, min(band, h), c),
                         precision=precision)
        return carry, out

    _, tiles = jax.lax.scan(tile, None, (xs, ys, starts))
    return tiles.reshape(ho, wo, c)


def separable_sample(image: jnp.ndarray, src_x: jnp.ndarray,
                     src_y: jnp.ndarray, precision=None,
                     dot_dtype=None) -> jnp.ndarray:
    """Bilinear sample for AXIS-ALIGNED maps (rotation == 0): src_x
    constant along rows, src_y constant along columns.  Two hat-weight
    matmuls over the full image — the cheapest exact path, used by the
    whole-image detection warp and the embeddings crop.

    ``dot_dtype=jnp.bfloat16`` runs the matmuls in bf16 with f32
    accumulation: uint8 pixels are exact in bf16, so only the hat
    weights round (~2^-8 relative) — at most one uint8 quantization
    level on the output, the same contract as the Pallas warp kernel's
    bf16 dots.  Halves the matmul HBM traffic (the detection warp is
    the cascade's largest non-CNN cost)."""
    h, w, c = image.shape
    ho, wo = src_x.shape
    xs = src_x[0]            # [Wo]
    ys = src_y[:, 0]         # [Ho]
    wx = _hat(jnp.arange(w, dtype=jnp.float32)[None, :] - xs[:, None])
    wy = _hat(jnp.arange(h, dtype=jnp.float32)[None, :] - ys[:, None])
    if dot_dtype is not None:
        image = image.astype(dot_dtype)
        wx = wx.astype(dot_dtype)
        wy = wy.astype(dot_dtype)
    t1 = jnp.dot(wy, image.reshape(h, -1), precision=precision,
                 preferred_element_type=jnp.float32
                 ).reshape(ho, w, c)                         # [Ho, W, C]
    if dot_dtype is not None:
        # f32 accumulate, bf16 storage for the big intermediate
        t1 = t1.astype(dot_dtype)
    # x-contraction as ONE plain matmul on a [W, Ho*C] relayout rather
    # than einsum('ox,hxc->hoc', ...): the einsum lowers to Ho batched
    # matvecs (~7% slower on v5e, tools/tpu_sep_probe.py)
    t1t = t1.transpose(1, 0, 2).reshape(w, ho * c)
    out = jnp.dot(wx, t1t, precision=precision,
                  preferred_element_type=jnp.float32)        # [Wo, Ho*C]
    return out.reshape(wo, ho, c).transpose(1, 0, 2)


def separable_sample_planar(planes, src_x: jnp.ndarray,
                            src_y: jnp.ndarray, precision=None,
                            dot_dtype=None) -> jnp.ndarray:
    """``separable_sample`` over pre-built channel planes (the
    ``pallas_warp.make_planes`` output): per channel
    ``wy @ P @ wx^T`` with NO layout transposes at all — the planar
    path's detection warp.

    Zero-pad regions of the planes reproduce the zero-border semantics
    exactly, and taps outside the padded extent would only ever
    multiply border zeros, so no validity masks are needed.  planes: a
    list of three [Hp, Wp] arrays or one stacked [3, Hp, Wp]; returns
    [Ho, Wo, 3] f32."""
    if not isinstance(planes, (list, tuple)):
        planes = [planes[c] for c in range(3)]
    hp, wp = planes[0].shape
    xs = src_x[0]            # [Wo]
    ys = src_y[:, 0]         # [Ho]
    wx = _hat(jnp.arange(wp, dtype=jnp.float32)[None, :] - xs[:, None])
    wy = _hat(jnp.arange(hp, dtype=jnp.float32)[None, :] - ys[:, None])
    # dot_dtype=None keeps the dots FULLY exact even over bf16 planes:
    # uint8 pixel values are exact in bf16, so upcasting the planes to
    # f32 reproduces the f32-plane result bit-for-bit (the bf16 planes
    # still halve the HBM read)
    if dot_dtype is not None:
        wx = wx.astype(dot_dtype)
        wy = wy.astype(dot_dtype)
    outs = []
    for p in planes:
        p = p.astype(dot_dtype if dot_dtype is not None
                     else jnp.float32)
        t1 = jnp.dot(wy, p, precision=precision,
                     preferred_element_type=jnp.float32)  # [Ho, Wp]
        if dot_dtype is not None:
            t1 = t1.astype(dot_dtype)
        outs.append(jnp.dot(t1, wx.T, precision=precision,
                            preferred_element_type=jnp.float32))
    return jnp.stack(outs, axis=-1)                       # [Ho, Wo, 3]


def warp_image_to_tensor(image: jnp.ndarray,
                         roi_abs: jnp.ndarray,
                         out_size: Tuple[int, int],
                         keep_aspect_ratio: bool,
                         output_range: Tuple[float, float] = (0.0, 1.0),
                         flip_horizontal=False,
                         quantize_uint8: bool = True,
                         method: str = "gather",
                         band: int = 32,
                         precision=None,
                         dot_dtype=None):
    """The fused ``image_to_tensor``: one resampling pass + one fma.

    Args:
      image: [H, W, 3] uint8 or float source image (RGB).
      roi_abs: (5,) array of (cx, cy, w, h, rotation) in ABSOLUTE pixel
        coordinates (traced; callers scale normalized ROIs by image size).
      out_size: static (width, height) of the output tensor.
      keep_aspect_ratio: static; True applies reference letterboxing.
      output_range: static (min, max) pixel normalization range.
      flip_horizontal: traced or static bool (mirrors the output).
      method: static sampling backend —
        "gather"    exact XLA gather (reference path; fast on CPU),
        "pallas"    banded hat-matmul Pallas TPU kernel (the fast path
                    for rotated ROIs; see ops/pallas_warp.py),
        "mxu"       the same algorithm in pure XLA (slower: weight
                    matrices round-trip HBM; kept as a portable check),
        "separable" two-matmul path for rotation-free ROIs.
      band: vertical source band per 8 output rows ("mxu"/"pallas").

    Returns:
      (tensor [Ho, Wo, 3] f32, padding (4,) f32 = (l, t, r, b)).
    """
    img = image.astype(jnp.float32)
    src_x, src_y, padding = _source_coords(roi_abs, out_size,
                                           keep_aspect_ratio,
                                           flip_horizontal)
    xload = 256
    rt = 8
    if isinstance(method, tuple) and method[0] == "pallas":
        # explicit per-call config from choose_warp_method (host-side
        # concrete-ROI dispatch): trust it, skip the worst-case gate
        from . import pallas_warp
        _, cw, xload, band, rt = method
        method = "pallas"
    elif method == "pallas":
        # Static feasibility gates, falling back to the exact gather
        # (slow but correct):
        #   * the per-block x-extent must fit the 128-lane window, so
        #     the column-block width shrinks with the worst-case
        #     (whole-image) ROI-to-output scale and bows out entirely
        #     for extreme downscales;
        #   * output dims must tile 8 x cw.
        # Frame size is NOT a gate: when the padded planes exceed the
        # VMEM budget the kernel switches to HBM-resident planes with
        # per-block strip DMA (ops/pallas_warp._warp_kernel_strips).
        from . import pallas_warp
        h_, w_ = image.shape[0], image.shape[1]
        cw = pallas_warp.pick_cw(max(w_ / out_size[0],
                                     h_ / out_size[1]))
        if cw == 0 or out_size[0] % cw or out_size[1] % 8:
            method = "gather"
    if method == "pallas":
        out = pallas_warp.warp_sample(img, src_x, src_y, band=band,
                                      cw=cw, xload=xload, rt=rt)
    elif method == "mxu":
        out = mxu_sample(img, src_x, src_y, band=band, precision=precision)
    elif method == "separable":
        out = separable_sample(img, src_x, src_y, precision=precision,
                               dot_dtype=dot_dtype)
    else:
        out = bilinear_sample(img, src_x, src_y)
    return _normalize_pixels(out, output_range, quantize_uint8), padding


def resolve_warp_method(method: str = "auto") -> str:
    """Map "auto" to the platform's fast exact path: the Pallas MXU
    kernel on TPU, the XLA gather elsewhere."""
    if method != "auto":
        return method
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "gather"


def choose_warp_method(method: str, roi_abs_rows, image_size,
                       out_size, keep_aspect_ratio: bool,
                       plane_dtype=None):
    """Per-call warp dispatch for the standalone models' host APIs.

    Their ROI values are CONCRETE before dispatch, so the block
    geometry is sized to the actual call instead of a worst-case
    whole-image ROI: the rolled 128-lane window first (cheapest), then
    the 512-lane wide window for large ROI-to-output scales (4K
    close-up faces), and only geometry beyond both takes the exact
    gather.  (The fused cascade, whose ROIs are traced, surfaces the
    same condition dynamically as ``CascadeResult.envelope_ok``.)

    Returns either a plain method string or a ``("pallas", cw, xload,
    band, rt)`` config tuple — both hashable jit-cache keys that
    ``warp_image_to_tensor`` accepts as ``method``."""
    if method != "pallas":
        return method
    import numpy as np

    from . import pallas_warp

    # The standalone dispatch path always samples over f32 planes
    # (warp_image_to_tensor's pallas branch -> warp_sample ->
    # make_planes with its default dtype), whose strip geometry is
    # 8-row aligned with up to 7 rows of start slack.  bf16 planes
    # (16-row tiles, 15 rows slack) only occur on the fused cascade's
    # traced path, which budgets its own bands (pipeline._warp_cfg) —
    # reject them here so the band arithmetic below can never
    # under-cover if a future caller wires bf16 planes through.
    if plane_dtype is None:
        import jax.numpy as jnp
        plane_dtype = jnp.float32
    y_align = pallas_warp.plane_y_align(plane_dtype)
    assert y_align == 8, \
        "choose_warp_method budgets f32-plane strip geometry only"

    rows = np.atleast_2d(np.asarray(roi_abs_rows, np.float32))
    wo, ho = out_size
    # the kernel clamps xload to the padded plane width, so the wide
    # config's x-budget must shrink with narrow frames (same clamp
    # rule as FaceCascade._warp_cfg) instead of over-promising
    wp = pallas_warp.padded_width(image_size[0])
    for cw, xload in ((32, 256), (16, min(512, wp))):
        if wo % cw or ho % 8:
            continue
        x_budget = 126 if xload == 256 else xload - 129
        # taller row-tiles cut per-output-row strip traffic (the
        # kernel's measured floor) whenever the band grows
        # sub-linearly in rt — pick the cheapest feasible one
        # (cost model: tiles * band = total strip rows per warp).
        # The band is rounded UP to 32-row buckets: the tuple below is
        # a jit-cache key, and a continuously ROI-derived band would
        # recompile the whole model pipeline every few frames of a
        # slowly-zooming video (minutes per compile on remote-compile
        # setups); buckets bound the key space per (h, w, cw).
        best = None
        for rt in (32, 16, 8):
            if ho % rt:
                continue
            need_band = 0.0
            ok = True
            for r in rows:
                x_ext, y_ext = pallas_warp.extents_host(
                    r, out_size, keep_aspect_ratio, cw, rt)
                if x_ext > x_budget:
                    ok = False
                    break
                need_band = max(need_band, y_ext + (y_align - 1))
            if not ok:
                continue
            band = -(-max(32, int(np.ceil(need_band))) // 32) * 32
            if band > 256:
                continue
            cost = (ho // rt) * band
            if best is None or cost < best[0]:
                best = (cost, rt, band)
        if best is not None:
            _, rt, band = best
            return ("pallas", cw, xload, band, rt)
    return "gather"


def auto_band(src_extent: int, out_h: int, minimum: int = 48) -> int:
    """Vertical source band sized so the whole-image warp (the largest
    rotation-free ROI a model sees) fits exactly.

    ``src_extent`` must be the image's LONG side: with letterbox
    preprocessing the content is scaled by max(W, H), so 8 output rows
    span 8*max(W, H)/Ho source rows; margin covers the two interpolation
    taps, sublane alignment and modest ROI rotation."""
    need = int(8 * src_extent / out_h) + 24
    return max(minimum, -(-need // 8) * 8)


def whole_image_roi(image_size: Tuple[int, int]) -> jnp.ndarray:
    """Default ROI covering the full image, in absolute coordinates
    (reference transform.rs:190-199)."""
    w, h = image_size
    return jnp.array([0.5 * w, 0.5 * h, float(w), float(h), 0.0],
                     dtype=jnp.float32)


def image_to_tensor(image, roi=None, output_size: Optional[Tuple[int, int]]
                    = None, keep_aspect_ratio: bool = False,
                    output_range: Tuple[float, float] = (0.0, 1.0),
                    flip_horizontal: bool = False):
    """Host-facing ``image_to_tensor`` with the reference signature
    (reference transform.rs:188-309): RGB image + optional normalized
    ``Rect`` ROI -> ``ImageTensor`` (tensor, letterbox padding,
    original size).  The models fuse this on device; this wrapper is
    for users of the standalone preprocessing API.
    """
    import numpy as np

    from ..types import ImageTensor, Rect
    from ..utils.image_io import load_image

    img = load_image(image)
    h, w = img.shape[:2]
    whole = roi is None
    if roi is None:
        roi = Rect(0.5, 0.5, 1.0, 1.0, 0.0, normalized=True)
    r = roi.scaled((float(w), float(h)), normalize=False)
    if output_size is None:
        output_size = (int(r.width), int(r.height))
    two = (letterbox_two_stage_params((w, h), output_size)
           if (whole and keep_aspect_ratio) else None)
    if two is not None:
        tensor, padding = letterbox_two_stage(
            jnp.asarray(img).astype(jnp.float32), (w, h), output_size,
            two, output_range)
        if flip_horizontal:
            tensor = tensor[:, ::-1]  # reference flips the final Mat
    else:
        roi_abs = jnp.asarray(np.array(
            [r.x_center, r.y_center, r.width, r.height, r.rotation],
            np.float32))
        tensor, padding = warp_image_to_tensor(
            jnp.asarray(img), roi_abs, output_size, keep_aspect_ratio,
            output_range, flip_horizontal)
    pad = np.asarray(padding, dtype=np.float64)
    return ImageTensor(np.asarray(tensor),
                       (pad[0], pad[1], pad[2], pad[3]), (w, h))

"""Detection post-processing as fixed-shape, jit-compatible tensor programs.

Replaces the reference's data-dependent loops with masked tensor programs:

* ``decode_boxes``        — reference face_detection.rs:269-296
* ``clamped_sigmoid``     — reference face_detection.rs:300-314 (±80 clamp)
* ``weighted_nms``        — reference nms.rs:56-124 as a static-trip-count
  masked merge: per-iteration score argmax + on-the-fly IoU row over the
  full candidate pool (MediaPipe weighted NMS, exact at any N)
* ``plain_nms``           — reference nms.rs:19-53
* ``letterbox_removal``   — reference transform.rs:115-142
* ``project_landmarks``   — reference transform.rs:351-432

Everything is O(M^2) on a few-hundred-row tensor — trivial work for the
VPU; the win is that the whole detect->NMS->project chain stays on device
with zero host round-trips.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

RAW_SCORE_LIMIT = 80.0  # reference face_detection.rs:133 (not MediaPipe's
# 100: the reference deliberately clamps lower to avoid f32 overflow)
MIN_SCORE = 0.5  # face_detection.rs:136
MIN_SUPPRESSION_THRESHOLD = 0.3  # face_detection.rs:139


def decode_boxes(raw_boxes: jnp.ndarray, anchors: jnp.ndarray, scale: float
                 ) -> jnp.ndarray:
    """raw [N, 2*P] -> [N, P, 2] decoded points.

    Point rows: 0 = box center -> converted to top-left corner,
    1 = box size -> converted to bottom-right corner, 2.. = keypoints.
    All point rows except row 1 are anchor-shifted.
    """
    n = raw_boxes.shape[-2] if raw_boxes.ndim > 2 else raw_boxes.shape[0]
    pts = raw_boxes.reshape(-1, raw_boxes.shape[-1] // 2, 2) / scale
    num_points = pts.shape[1]
    shift = jnp.concatenate([
        jnp.ones((1,), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.ones((num_points - 2,), jnp.float32),
    ])
    pts = pts + shift[None, :, None] * anchors[:, None, :]
    center = pts[:, 0, :]
    half = pts[:, 1, :] / 2.0
    corner0 = center - half
    corner1 = center + half
    return jnp.concatenate(
        [corner0[:, None, :], corner1[:, None, :], pts[:, 2:, :]], axis=1)


def clamped_sigmoid(raw_scores: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(raw_scores, -RAW_SCORE_LIMIT, RAW_SCORE_LIMIT)
    return jax.nn.sigmoid(x)


def detection_validity(boxes: jnp.ndarray, scores: jnp.ndarray,
                       min_score: float = MIN_SCORE) -> jnp.ndarray:
    """score > threshold AND strictly positive box extent
    (reference face_detection.rs:317-323,326)."""
    ok_box = jnp.all(boxes[:, 1, :] > boxes[:, 0, :], axis=-1)
    return (scores > min_score) & ok_box


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of corner-format boxes [M, 4] -> [M, M].

    Matches reference nms.rs:5-17: empty intersection or non-positive
    union denominator -> similarity 0.
    """
    xmin, ymin, xmax, ymax = (boxes[:, 0], boxes[:, 1], boxes[:, 2],
                              boxes[:, 3])
    ixmin = jnp.maximum(xmin[:, None], xmin[None, :])
    iymin = jnp.maximum(ymin[:, None], ymin[None, :])
    ixmax = jnp.minimum(xmax[:, None], xmax[None, :])
    iymax = jnp.minimum(ymax[:, None], ymax[None, :])
    iw = ixmax - ixmin
    ih = iymax - iymin
    inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    w = xmax - xmin
    h = ymax - ymin
    area = jnp.where((w > 0) & (h > 0), w * h, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _sort_and_truncate(data, scores, valid, top_m):
    data = jnp.asarray(data)
    scores = jnp.asarray(scores)
    valid = jnp.asarray(valid)
    neg = jnp.float32(-1e30)
    masked = jnp.where(valid, scores, neg)
    # top_k (score-descending) instead of a full argsort: N is 896/2304
    # and only top_m rows can survive NMS; top_k lowers much better on
    # TPU than sort.
    _, order = jax.lax.top_k(masked, min(top_m, masked.shape[0]))
    return data[order], scores[order], valid[order]


def weighted_nms(data: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                 max_outputs: int,
                 threshold: float = MIN_SUPPRESSION_THRESHOLD,
                 top_m: int = 128):
    """MediaPipe weighted NMS as a masked fixed-shape program.

    Semantics of reference nms.rs:56-124: repeatedly take the highest-
    scoring remaining detection, gather every remaining detection with
    IoU > threshold (the top one always matches itself), emit the
    score-weighted average of their rows with the top score, and remove
    the merged set.  The reference's loop-guard (break when nothing was
    removed — only reachable with zero-area boxes) maps to a sticky
    ``stopped`` flag.

    Args:
      data: [N, P, 2] detection rows (corners + keypoints), normalized.
      scores: [N] sigmoid scores.
      valid: [N] bool (score threshold & box validity).
      max_outputs: static number of merged detections to emit.
      top_m: unused by this path since the exact full-pool rewrite
        (kept for API compatibility; ``plain_nms`` still uses it).

    Returns:
      (out_data [T, P, 2], out_scores [T], out_valid [T])
    """
    # NOTE on bit-stability across max_faces settings: the top-1 fast
    # path computes the same first merge as the scan path but in a
    # different reduction order (single fused pass over all N anchors vs
    # sorted top_m pool), so the two can differ by ~1e-5 in the merged
    # coordinates.  The scan path is the CANONICAL semantics (it is the
    # one oracle-tested against the sequential reference transcription);
    # the fast path is an O(N) refactoring of its first iteration.
    if max_outputs == 1:
        return _weighted_nms_top1(data, scores, valid, threshold)

    # Exact sequential semantics over the FULL candidate pool — no
    # sort and no N^2 IoU matrix.  Each scan iteration argmaxes the
    # alive scores (argmax returns the FIRST max index, matching the
    # reference's stable descending sort tie-break) and builds the top
    # row's IoU against everything on the fly: O(max_outputs * N)
    # instead of a full top_k sort (k=N lowers as a sort) plus an
    # [N, N] matrix.  At N=2304 this is ~7 ms/step faster per crowded
    # batch-32 frame set (tools/tpu_kface_probe.py) and makes the
    # ``top_m`` truncation unnecessary for accuracy: the pool is
    # always exact, as in reference nms.rs:56-124.
    d = jnp.asarray(data)
    sc = jnp.asarray(scores)
    v = jnp.asarray(valid)
    xmin, ymin = d[:, 0, 0], d[:, 0, 1]
    xmax, ymax = d[:, 1, 0], d[:, 1, 1]
    w_ = xmax - xmin
    h_ = ymax - ymin
    area = jnp.where((w_ > 0) & (h_ > 0), w_ * h_, 0.0)
    neg = jnp.float32(-1e30)
    idx = jnp.arange(v.shape[0])

    def body(carry, _):
        alive, stopped = carry
        any_alive = jnp.any(alive)
        top = jnp.argmax(jnp.where(alive, sc, neg))
        top_box = d[top]
        ixmin = jnp.maximum(xmin, top_box[0, 0])
        iymin = jnp.maximum(ymin, top_box[0, 1])
        ixmax = jnp.minimum(xmax, top_box[1, 0])
        iymax = jnp.minimum(ymax, top_box[1, 1])
        iw = ixmax - ixmin
        ih = iymax - iymin
        inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
        union = area + area[top] - inter
        iou_row = jnp.where(union > 0, inter / union, 0.0)
        cand = alive & (iou_row > threshold)
        any_cand = jnp.any(cand)
        w = jnp.where(cand, sc, 0.0)
        wsum = jnp.maximum(w.sum(), 1e-12)
        merged = jnp.tensordot(w, d, axes=1) / wsum
        out_d = jnp.where(any_cand, merged, top_box)
        out_s = sc[top]
        out_v = any_alive & ~stopped
        alive = alive & ~cand & (idx != top)
        stopped = stopped | (~any_cand)
        return (alive, stopped), (out_d, out_s, out_v)

    (_, _), (out_d, out_s, out_v) = jax.lax.scan(
        body, (v, jnp.asarray(False)), None, length=max_outputs)
    return out_d, out_s, out_v


def _weighted_nms_top1(data, scores, valid, threshold):
    """Single-output weighted NMS: the first merge of the sequential
    algorithm needs no sort and no scan — top detection by argmax, one
    IoU row, one weighted average.  O(N) instead of O(N^2); this is the
    fused cascade's hot path (one face per frame)."""
    masked = jnp.where(valid, scores, jnp.float32(-1e30))
    top = jnp.argmax(masked)
    top_box = data[top]                                    # [P, 2]
    xmin, ymin = data[:, 0, 0], data[:, 0, 1]
    xmax, ymax = data[:, 1, 0], data[:, 1, 1]
    ixmin = jnp.maximum(xmin, top_box[0, 0])
    iymin = jnp.maximum(ymin, top_box[0, 1])
    ixmax = jnp.minimum(xmax, top_box[1, 0])
    iymax = jnp.minimum(ymax, top_box[1, 1])
    iw = ixmax - ixmin
    ih = iymax - iymin
    inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    w_ = xmax - xmin
    h_ = ymax - ymin
    area = jnp.where((w_ > 0) & (h_ > 0), w_ * h_, 0.0)
    top_area = area[top]
    union = area + top_area - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    cand = valid & (iou > threshold)
    w = jnp.where(cand, scores, 0.0)
    merged = jnp.tensordot(w, data, axes=1) / jnp.maximum(w.sum(), 1e-12)
    out_d = jnp.where(jnp.any(cand), merged, top_box)
    return out_d[None], scores[top][None], valid[top][None]


def plain_nms(data: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              max_outputs: int,
              threshold: float = MIN_SUPPRESSION_THRESHOLD,
              top_m: int = 128):
    """Greedy (non-weighted) NMS, reference nms.rs:19-53."""
    d, sc, v = _sort_and_truncate(data, scores, valid, top_m)
    boxes = jnp.stack([d[:, 0, 0], d[:, 0, 1], d[:, 1, 0], d[:, 1, 1]],
                      axis=-1)
    iou = _iou_matrix(boxes)
    m = v.shape[0]

    def body(carry, i):
        kept = carry  # bool [M]: emitted so far
        suppressed = jnp.any(kept & (iou[i] > threshold))
        keep = v[i] & ~suppressed
        return kept | (keep & (jnp.arange(m) == i)), keep

    kept, keep_flags = jax.lax.scan(body, jnp.zeros(m, bool),
                                    jnp.arange(m))
    # compact the kept rows to the front, fixed size
    order = jnp.argsort(~keep_flags, stable=True)[:max_outputs]
    return d[order], sc[order], keep_flags[order]


def letterbox_removal(data: jnp.ndarray, padding: jnp.ndarray
                      ) -> jnp.ndarray:
    """Undo letterboxing on detection rows [..., P, 2]
    (reference transform.rs:115-142)."""
    left, top, right, bottom = (padding[0], padding[1], padding[2],
                                padding[3])
    h_scale = 1.0 - (left + right)
    v_scale = 1.0 - (top + bottom)
    x = (data[..., 0] - left) / h_scale
    y = (data[..., 1] - top) / v_scale
    return jnp.stack([x, y], axis=-1)


def project_landmarks(raw: jnp.ndarray,
                      tensor_size: Tuple[int, int],
                      image_size: Tuple[int, int],
                      padding: jnp.ndarray,
                      roi_abs: Optional[jnp.ndarray],
                      flip_horizontal=False) -> jnp.ndarray:
    """Tensor-space landmarks -> normalized image-space [L, 3].

    Reference transform.rs:351-432, including the MediaPipe z-convention
    (z divided by tensor width and scaled by roi width).
    """
    wt, ht = tensor_size
    pts = raw.reshape(-1, 3) / jnp.array([wt, ht, wt], jnp.float32)
    flip = jnp.asarray(flip_horizontal)
    x = jnp.where(flip, 1.0 - pts[:, 0], pts[:, 0])
    y = pts[:, 1]
    z = pts[:, 2]

    left, top, right, bottom = (padding[0], padding[1], padding[2],
                                padding[3])
    h_scale = 1.0 - (left + right)
    v_scale = 1.0 - (top + bottom)
    x = (x - left) / h_scale
    y = (y - top) / v_scale
    z = z / h_scale

    if roi_abs is not None:
        w, h = image_size
        ncx, ncy = roi_abs[0] / w, roi_abs[1] / h
        nw, nh = roi_abs[2] / w, roi_abs[3] / h
        rot = roi_abs[4]
        s, c = jnp.sin(rot), jnp.cos(rot)
        xc = x - 0.5
        yc = y - 0.5
        rx = xc * c - yc * s
        ry = xc * s + yc * c
        x = rx * nw + ncx
        y = ry * nh + ncy
        z = z * nw
    return jnp.stack([x, y, z], axis=-1)

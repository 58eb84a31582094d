#!/usr/bin/env python
"""Generate BASELINE.md detection ground truth from the reference stack.

A direct Python transcription of the reference's detection pipeline —
OpenCV preprocessing (transform.rs:188-309), TFLite interpreter invoke
(face_detection.rs:205-267), numpy box decode (face_detection.rs:269-296),
±80-clamped sigmoid (:300-314), sequential weighted NMS (nms.rs:56-124)
and letterbox removal (transform.rs:115-142).  Entirely independent of
the tpu_face runtime except the (count-validated) SSD anchor table.

``cascade`` mode additionally transcribes the full landmark chain —
face_detection_to_roi (face_landmark.rs:180-198), the rotated-ROI warp
(transform.rs:188-309 with keep_aspect=false for the mesh / =true +
flip for the irises), TFLite face_landmark + iris_landmark invokes, and
project_landmarks (transform.rs:351-432) — producing the mesh / eye-ROI
/ iris-center oracle rows for any test image.

Usage: python tools/gen_ground_truth.py [image] [model|cascade ...]
"""

import sys

import cv2
import numpy as np
import tensorflow as tf

sys.path.insert(0, "/root/repo")

from tpu_face.ops import anchors as anchors_lib  # noqa: E402

MODELS = {
    "back": ("face_detection_back", anchors_lib.SSDOptions.back()),
    "front": ("face_detection_front", anchors_lib.SSDOptions.front()),
    "short": ("face_detection_short_range", anchors_lib.SSDOptions.short()),
    "full": ("face_detection_full_range", anchors_lib.SSDOptions.full()),
    "full_sparse": ("face_detection_full_range_sparse",
                    anchors_lib.SSDOptions.full()),
}

REF = "/root/reference"


def image_to_tensor(img_rgb, out_size, output_range):
    """transform.rs:188-309, whole-image ROI, keep_aspect=true."""
    ih, iw = img_rgb.shape[:2]
    # roi scaled to abs: center (iw/2, ih/2), size (iw, ih), rot 0
    w, h = int(iw), int(ih)
    src = np.array([(0, 0), (iw, 0), (iw, ih), (0, ih)], np.float32)
    dst = np.array([(0, 0), (w, 0), (w, h), (0, h)], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    roi_image = cv2.warpPerspective(img_rgb, m, (w, h), flags=cv2.INTER_LINEAR,
                                    borderMode=cv2.BORDER_CONSTANT)
    pad_x = pad_y = 0.0
    out_aspect = float(out_size[1] // out_size[0])  # integer-division quirk
    roi_aspect = ih / iw
    new_w, new_h = int(iw), int(ih)
    if out_aspect > roi_aspect:
        new_h = int(iw * out_aspect)
        pad_y = (1.0 - roi_aspect / out_aspect) / 2.0
    else:
        new_w = int(ih / out_aspect)
        pad_x = (1.0 - out_aspect / roi_aspect) / 2.0
    if new_w != int(iw) or new_h != int(ih):
        ph, pv = int(pad_x * new_w), int(pad_y * new_h)
        roi_image = cv2.copyMakeBorder(roi_image, pv, pv, ph, ph,
                                       cv2.BORDER_CONSTANT, value=0)
        roi_image = cv2.resize(roi_image, (new_w, new_h),
                               interpolation=cv2.INTER_LINEAR)
    roi_image = cv2.resize(roi_image, out_size,
                           interpolation=cv2.INTER_LINEAR)
    lo, hi = output_range
    tensor = roi_image.astype(np.float64) * (hi - lo) / 255.0 + lo
    return tensor.astype(np.float32), (pad_x, pad_y, pad_x, pad_y)


def decode_boxes(raw, anchors, scale):
    """face_detection.rs:269-296."""
    pts = raw.reshape(-1, raw.shape[-1] // 2, 2) / scale
    pts[:, 0] += anchors[:, None, :][:, 0]
    pts[:, 2:] += anchors[:, None, :]
    center = pts[:, 0].copy()
    half = pts[:, 1] / 2.0
    pts[:, 0] = center - half
    pts[:, 1] = center + half
    return pts


def weighted_nms(data, scores, thr=0.3, min_score=0.5):
    """nms.rs:56-124 sequential transcription."""

    def iou(a, b):
        xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
        xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
        if not (xmin < xmax and ymin < ymax):
            return 0.0
        inter = (xmax - xmin) * (ymax - ymin)
        area = lambda r: max(r[2] - r[0], 0) * max(r[3] - r[1], 0)
        denom = area(a) + area(b) - inter
        return inter / denom if denom > 0 else 0.0

    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    remaining = [i for i in order
                 if scores[i] > min_score
                 and np.all(data[i][1] > data[i][0])]
    out = []
    while remaining:
        top = remaining[0]
        tb = (data[top][0][0], data[top][0][1],
              data[top][1][0], data[top][1][1])
        cands, rest = [], []
        for i in remaining:
            b = (data[i][0][0], data[i][0][1], data[i][1][0], data[i][1][1])
            (cands if iou(b, tb) > thr else rest).append(i)
        if len(rest) == len(remaining):
            break
        merged = data[top].copy()
        if cands:
            w = np.array([scores[i] for i in cands])[:, None, None]
            merged = (w * np.stack([data[i] for i in cands])).sum(0) / w.sum()
        out.append((merged, scores[top]))
        remaining = rest
    return out


def run(image_path, model_key):
    name, ssd_opts = MODELS[model_key]
    bgr = cv2.imread(image_path)
    img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    ih, iw = img.shape[:2]

    interp = tf.lite.Interpreter(model_path=f"{REF}/models/{name}.tflite")
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    _, h, w, _ = inp["shape"]
    tensor, padding = image_to_tensor(img, (w, h), (-1.0, 1.0))
    interp.set_tensor(inp["index"], tensor[None])
    interp.invoke()
    outs = {tuple(d["shape"]): interp.get_tensor(d["index"])
            for d in interp.get_output_details()}
    anchors = anchors_lib.ssd_generate_anchors(ssd_opts)
    n = anchors.shape[0]
    raw_boxes = outs[(1, n, 16)][0]
    raw_scores = outs[(1, n, 1)][0].reshape(-1)

    boxes = decode_boxes(raw_boxes.astype(np.float64), anchors, float(h))
    scores = 1.0 / (1.0 + np.exp(-np.clip(raw_scores, -80, 80)))
    merged = weighted_nms(boxes, scores)

    # letterbox removal (transform.rs:115-142)
    left, top, right, bottom = padding
    hs, vs = 1.0 - (left + right), 1.0 - (top + bottom)
    results = []
    for d, s in merged:
        d = d.copy()
        d[..., 0] = (d[..., 0] - left) / hs
        d[..., 1] = (d[..., 1] - top) / vs
        results.append((d, s))
    print(f"== {model_key} on {image_path} ({iw}x{ih}) ==")
    for d, s in results:
        px = d * np.array([iw, ih])
        print(f"score {s:.4f}; bbox px ({px[0,0]:.1f}, {px[0,1]:.1f})-"
              f"({px[1,0]:.1f}, {px[1,1]:.1f})")
        kps = ", ".join(f"({x:.1f},{y:.1f})" for x, y in px[2:])
        print(f"  keypoints px: {kps}")
    return results


# ---- full-cascade oracle (mesh + iris stages) --------------------------


def _rect_points(cx, cy, w, h, rot):
    """types.rs:80-96 rotated corners (abs coords)."""
    pts = np.array([(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
                    (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2)],
                   np.float64)
    if rot != 0.0:
        s, c = np.sin(rot), np.cos(rot)
        d = pts - (cx, cy)
        pts = np.stack([cx + d[:, 0] * c - d[:, 1] * s,
                        cy + d[:, 0] * s + d[:, 1] * c], axis=1)
    return pts


def _bbox_to_roi(bbox, image_size, rot_keypoints, scale, square_long=True):
    """transform.rs:44-109: normalized bbox -> normalized rotated ROI."""
    iw, ih = image_size
    xmin, ymin, xmax, ymax = bbox
    w_abs = (xmax - xmin) * iw
    h_abs = (ymax - ymin) * ih
    if square_long:
        long_side = max(w_abs, h_abs)
        w, h = long_side / iw, long_side / ih
    else:
        w, h = xmax - xmin, ymax - ymin
    w, h = w * scale[0], h * scale[1]
    cx = xmin + (xmax - xmin) / 2.0
    cy = ymin + (ymax - ymin) / 2.0
    (x0, y0), (x1, y1) = rot_keypoints
    angle = -np.arctan2(y0 - y1, x1 - x0)
    rot = angle - 2 * np.pi * np.floor((angle + np.pi) / (2 * np.pi))
    return (cx, cy, w, h, rot)


def _warp_roi(img_rgb, roi_norm, out_size, keep_aspect, output_range,
              flip_horizontal):
    """transform.rs:188-309 with an explicit rotated ROI."""
    ih, iw = img_rgb.shape[:2]
    cx, cy, w, h, rot = roi_norm
    cx, cy, w, h = cx * iw, cy * ih, w * iw, h * ih
    if keep_aspect:
        width, height = int(int(w)), int(int(h))  # Rect::size truncation
    else:
        width, height = out_size
    src = _rect_points(cx, cy, w, h, rot).astype(np.float32)
    dst = np.array([(0, 0), (width, 0), (width, height), (0, height)],
                   np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    roi_image = cv2.warpPerspective(img_rgb, m, (width, height),
                                    flags=cv2.INTER_LINEAR,
                                    borderMode=cv2.BORDER_CONSTANT)
    pad_x = pad_y = 0.0
    if keep_aspect:
        out_aspect = float(out_size[1] // out_size[0])
        roi_aspect = h / w
        new_w, new_h = int(w), int(h)
        if out_aspect > roi_aspect:
            new_h = int(w * out_aspect)
            pad_y = (1.0 - roi_aspect / out_aspect) / 2.0
        else:
            new_w = int(h / out_aspect)
            pad_x = (1.0 - out_aspect / roi_aspect) / 2.0
        if new_w != int(w) or new_h != int(h):
            ph, pv = int(pad_x * new_w), int(pad_y * new_h)
            roi_image = cv2.copyMakeBorder(roi_image, pv, pv, ph, ph,
                                           cv2.BORDER_CONSTANT, value=0)
            roi_image = cv2.resize(roi_image, (new_w, new_h),
                                   interpolation=cv2.INTER_LINEAR)
        roi_image = cv2.resize(roi_image, out_size,
                               interpolation=cv2.INTER_LINEAR)
    if flip_horizontal:
        roi_image = roi_image[:, ::-1]
    lo, hi = output_range
    tensor = (roi_image.astype(np.float64) * (hi - lo) / 255.0
              + lo).astype(np.float32)
    return tensor, (pad_x, pad_y, pad_x, pad_y)


def _project_landmarks(raw, tensor_size, padding, roi_norm,
                       flip_horizontal):
    """transform.rs:351-432, ROI path."""
    pts = raw.reshape(-1, 3).astype(np.float64)
    tw, th = tensor_size
    pts /= (tw, th, tw)
    if flip_horizontal:
        pts[:, 0] = 1.0 - pts[:, 0]
    if padding != (0.0, 0.0, 0.0, 0.0):
        left, top, right, bottom = padding
        hs, vs = 1.0 - (left + right), 1.0 - (top + bottom)
        pts[:, 0] = (pts[:, 0] - left) / hs
        pts[:, 1] = (pts[:, 1] - top) / vs
        pts[:, 2] = pts[:, 2] / hs
    cx, cy, w, h, rot = roi_norm
    s, c = np.sin(rot), np.cos(rot)
    xy = pts[:, :2] - 0.5
    rx = xy[:, 0] * c - xy[:, 1] * s
    ry = xy[:, 0] * s + xy[:, 1] * c
    return np.stack([rx * w + cx, ry * h + cy, pts[:, 2] * w], axis=1)


def _invoke(model, tensor):
    interp = tf.lite.Interpreter(model_path=f"{REF}/models/{model}.tflite")
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    interp.set_tensor(inp["index"], tensor[None])
    interp.invoke()
    return {int(np.prod(d["shape"])): interp.get_tensor(d["index"])
            for d in interp.get_output_details()}


def run_cascade(image_path, det_model="back"):
    """Full reference chain: detect -> mesh -> eye ROIs -> 2x iris
    (lib.rs:18-84 flow), printing the BASELINE.md oracle rows."""
    bgr = cv2.imread(image_path)
    img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    ih, iw = img.shape[:2]

    dets = run(image_path, det_model)
    d, score = dets[0]
    bbox = (d[0, 0], d[0, 1], d[1, 0], d[1, 1])
    eyes_px = [(d[2 + k, 0] * iw, d[2 + k, 1] * ih) for k in (0, 1)]
    face_roi = _bbox_to_roi(bbox, (iw, ih), eyes_px, (1.5, 1.5))
    print(f"face ROI: center ({face_roi[0]:.4f}, {face_roi[1]:.4f}), "
          f"w {face_roi[2]:.4f}, h {face_roi[3]:.4f}, "
          f"rot {face_roi[4]:.4f} rad")

    tensor, pad = _warp_roi(img, face_roi, (192, 192), False, (0., 1.),
                            False)
    outs = _invoke("face_landmark", tensor)
    flag = 1.0 / (1.0 + np.exp(-float(outs[1].reshape(()))))
    mesh = _project_landmarks(outs[1404].reshape(-1), (192, 192),
                              (0., 0., 0., 0.), face_roi, False)
    print(f"face_flag {flag:.6f}; mesh: "
          f"lmk[1] (nose) px ({mesh[1, 0] * iw:.2f}, {mesh[1, 1] * ih:.2f}), "
          f"lmk[33] ({mesh[33, 0] * iw:.2f}, {mesh[33, 1] * ih:.2f}), "
          f"lmk[263] ({mesh[263, 0] * iw:.2f}, {mesh[263, 1] * ih:.2f})")

    for name, (i0, i1), is_right in (("L", (33, 133), False),
                                     ("R", (362, 263), True)):
        pair = mesh[[i0, i1], :2]
        bbox_eye = (pair[:, 0].min(), pair[:, 1].min(),
                    pair[:, 0].max(), pair[:, 1].max())
        roi = _bbox_to_roi(bbox_eye, (iw, ih),
                           [tuple(pair[0]), tuple(pair[1])], (2.3, 2.3))
        print(f"eye ROI {name}: center ({roi[0]:.4f}, {roi[1]:.4f}) "
              f"w {roi[2]:.4f} rot {roi[4]:.4f}")
        tensor, pad = _warp_roi(img, roi, (64, 64), True, (0., 1.),
                                is_right)
        outs = _invoke("iris_landmark", tensor)
        iris = _project_landmarks(outs[15].reshape(-1), (64, 64), pad,
                                  roi, is_right)
        print(f"iris center {name} px ({iris[0, 0] * iw:.2f}, "
              f"{iris[0, 1] * ih:.2f})")


if __name__ == "__main__":
    image = sys.argv[1] if len(sys.argv) > 1 else \
        f"{REF}/test_data/man.jpg"
    keys = sys.argv[2:] or list(MODELS)
    for k in keys:
        if k == "cascade":
            run_cascade(image)
        else:
            run(image, k)

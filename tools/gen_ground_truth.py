#!/usr/bin/env python
"""Generate BASELINE.md detection ground truth from the reference stack.

A direct Python transcription of the reference's detection pipeline —
OpenCV preprocessing (transform.rs:188-309), TFLite interpreter invoke
(face_detection.rs:205-267), numpy box decode (face_detection.rs:269-296),
±80-clamped sigmoid (:300-314), sequential weighted NMS (nms.rs:56-124)
and letterbox removal (transform.rs:115-142).  Entirely independent of
the tpu_face runtime except the (count-validated) SSD anchor table.

Usage: python tools/gen_ground_truth.py [image] [model ...]
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


if __name__ == "__main__":
    image = sys.argv[1] if len(sys.argv) > 1 else \
        f"{REF}/test_data/man.jpg"
    keys = sys.argv[2:] or list(MODELS)
    for k in keys:
        run(image, k)

"""BlazeFace face detection (5 model variants) as a fused XLA pipeline.

API parity with the reference ``FaceDetection``
(reference: face_detection.rs:146-267) but TPU-native: preprocessing
(rotated-ROI warp + letterbox + normalize), the CNN, box decoding, clamped
sigmoid scoring, weighted NMS and letterbox removal are ONE jitted XLA
program per input-image geometry — no interpreter, no host round-trips
mid-pipeline.  The jitted program is cached per (H, W) and natively
batched via vmap in the cascade layer.
"""

import enum
from functools import lru_cache, partial
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import Graph, build_jax_fn
from ..ops import anchors as anchors_lib
from ..ops import image as image_ops
from ..ops import postprocess as post
from ..types import Detection, Rect
from ..utils.image_io import load_image

_DATA_DIR = Path(__file__).resolve().parent.parent / "data"


class FaceDetectionModel(enum.Enum):
    """Model variants (reference face_detection.rs:116-123)."""

    FRONT_CAMERA = 0
    BACK_CAMERA = 1
    SHORT = 2
    FULL = 3
    FULL_SPARSE = 4


class FaceIndex(enum.IntEnum):
    """Keypoint indexes (reference face_detection.rs:89-98)."""

    LEFT_EYE = 0
    RIGHT_EYE = 1
    NOSE_TIP = 2
    MOUTH = 3
    LEFT_EYE_TRAGION = 4
    RIGHT_EYE_TRAGION = 5


_MODEL_FILES = {
    FaceDetectionModel.FRONT_CAMERA: "face_detection_front",
    FaceDetectionModel.BACK_CAMERA: "face_detection_back",
    FaceDetectionModel.SHORT: "face_detection_short_range",
    FaceDetectionModel.FULL: "face_detection_full_range",
    FaceDetectionModel.FULL_SPARSE: "face_detection_full_range_sparse",
}

_SSD_OPTS = {
    FaceDetectionModel.FRONT_CAMERA: anchors_lib.SSDOptions.front(),
    FaceDetectionModel.BACK_CAMERA: anchors_lib.SSDOptions.back(),
    FaceDetectionModel.SHORT: anchors_lib.SSDOptions.short(),
    FaceDetectionModel.FULL: anchors_lib.SSDOptions.full(),
    FaceDetectionModel.FULL_SPARSE: anchors_lib.SSDOptions.full(),
}


class FaceDetection:
    """BlazeFace detector. ``infer`` accepts an RGB image (array, PIL,
    path or bytes) and an optional ROI ``Rect``; returns normalized
    ``Detection`` objects, strongest first."""

    def __init__(self,
                 model_type: FaceDetectionModel = FaceDetectionModel.SHORT,
                 model_path: Optional[str] = None,
                 max_faces: int = 16,
                 compute_dtype=jnp.float32,
                 warp_method: str = "auto",
                 nms_top_m: int = 128):
        base = Path(model_path) if model_path else _DATA_DIR
        npz = base / f"{_MODEL_FILES[model_type]}.npz"
        if not npz.exists():
            raise FileNotFoundError(
                f"converted model not found: {npz} — run "
                f"tools/convert_tflite.py on the .tflite first")
        self.model_type = model_type
        self.graph = Graph(npz)
        self._net = build_jax_fn(self.graph, compute_dtype=compute_dtype)
        self.anchors = jnp.asarray(
            anchors_lib.ssd_generate_anchors(_SSD_OPTS[model_type]))
        _, self.in_h, self.in_w, _ = self.graph.input_shape
        self.max_faces = max_faces
        # Historical candidate-pool bound: the weighted NMS is now an
        # exact full-pool scan at any max_faces (ops/postprocess.py —
        # per-iteration argmax + on-the-fly IoU row, no sort, no
        # truncation), matching the reference's unbounded sequential
        # loop (nms.rs:56-124) for every scene.  Kept as a field/knob
        # for API compatibility; it no longer affects weighted-NMS
        # accuracy or cost.
        self.nms_top_m = nms_top_m
        self._warp = image_ops.resolve_warp_method(warp_method)
        self._jitted = {}

    # ---- the fused device program -------------------------------------

    def _pipeline(self, image_f32, roi_abs, method=None,
                  two_stage=None):
        """[H,W,3] f32 + (5,) abs ROI -> (data [T,P,2], score [T],
        valid [T]).  Entirely on device.  ``two_stage``: static
        intermediate geometry for the exact double-resize letterbox
        (whole-image ROI on geometries where the fused single map is
        inexact; image_ops.letterbox_two_stage_params)."""
        if two_stage is not None:
            h_, w_ = image_f32.shape[0], image_f32.shape[1]
            tensor, padding = image_ops.letterbox_two_stage(
                image_f32, (w_, h_), (self.in_w, self.in_h),
                two_stage, (-1.0, 1.0))
        else:
            tensor, padding = image_ops.warp_image_to_tensor(
                image_f32, roi_abs, (self.in_w, self.in_h),
                keep_aspect_ratio=True, output_range=(-1.0, 1.0),
                method=method or self._warp,
                band=image_ops.auto_band(
                    max(image_f32.shape[0], image_f32.shape[1]),
                    self.in_h))
        raw_boxes, raw_scores = self._net(tensor[None])
        boxes = post.decode_boxes(raw_boxes[0], self.anchors,
                                  float(self.in_h))
        scores = post.clamped_sigmoid(raw_scores[0].reshape(-1))
        valid = post.detection_validity(boxes, scores)
        out_d, out_s, out_v = post.weighted_nms(
            boxes, scores, valid, max_outputs=self.max_faces,
            top_m=self.nms_top_m)
        out_d = post.letterbox_removal(out_d, padding)
        return out_d, out_s, out_v

    def _get_jitted(self, h, w, method, two_stage=None):
        key = (h, w, method, two_stage)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                partial(self._pipeline, method=method,
                        two_stage=two_stage))
        return self._jitted[key]

    def _get_jitted_batch(self, h, w, method, two_stage=None):
        key = ("batch", h, w, method, two_stage)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(jax.vmap(
                partial(self._pipeline, method=method,
                        two_stage=two_stage)))
        return self._jitted[key]

    # ---- host API ------------------------------------------------------

    def infer(self, image, roi: Optional[Rect] = None) -> List[Detection]:
        img = load_image(image)
        h, w = img.shape[:2]
        two = None
        if roi is None:
            roi_abs = np.array([0.5 * w, 0.5 * h, w, h, 0.0], np.float32)
            # whole-image ROI: geometries where int-truncated pads make
            # the reference's first resize non-identity take the exact
            # double-resize path (portrait-frame oracle parity)
            two = image_ops.letterbox_two_stage_params(
                (w, h), (self.in_w, self.in_h))
        else:
            r = roi.scaled((float(w), float(h)), normalize=False)
            roi_abs = np.array([r.x_center, r.y_center, r.width, r.height,
                                r.rotation], np.float32)
        # explicit ROIs beyond the Pallas envelope take the exact gather
        method = image_ops.choose_warp_method(
            self._warp, roi_abs, (w, h), (self.in_w, self.in_h), True)
        out_d, out_s, out_v = self._get_jitted(h, w, method, two)(
            jnp.asarray(img), jnp.asarray(roi_abs))
        out_d, out_s, out_v = (np.asarray(out_d), np.asarray(out_s),
                               np.asarray(out_v))
        return [Detection(out_d[i], out_s[i])
                for i in range(out_v.shape[0]) if out_v[i]]

    def infer_batch(self, images) -> List[List[Detection]]:
        """Batched detection: [B, H, W, 3] uint8/float array of
        same-sized RGB images -> per-image detection lists.  The whole
        batch runs as one vmapped XLA program (a capability the
        single-image reference lacks)."""
        # normalize lists only: .shape works on host AND device
        # arrays, and np.asarray on a device array would pull the
        # whole batch back through the host
        if not hasattr(images, "shape"):
            images = np.asarray(images)
        b, h, w = images.shape[:3]
        rois = np.broadcast_to(
            np.array([0.5 * w, 0.5 * h, w, h, 0.0], np.float32), (b, 5))
        method = image_ops.choose_warp_method(
            self._warp, rois[0], (w, h), (self.in_w, self.in_h), True)
        two = image_ops.letterbox_two_stage_params(
            (w, h), (self.in_w, self.in_h))
        out_d, out_s, out_v = self._get_jitted_batch(h, w, method, two)(
            jnp.asarray(images), jnp.asarray(np.ascontiguousarray(rois)))
        out_d, out_s, out_v = (np.asarray(out_d), np.asarray(out_s),
                               np.asarray(out_v))
        return [[Detection(out_d[i, j], out_s[i, j])
                 for j in range(out_v.shape[1]) if out_v[i, j]]
                for i in range(b)]

"""ArcFace-style face embeddings as a fused XLA pipeline.

API parity with the reference ``FaceEmbeddings``
(reference: face_embeddings.rs:22-109): axis-aligned bbox crop, resize to
112x112 in range (0,1), CNN, global L2 normalization.  Like the
reference, the model file is NOT bundled (reference README.md:9-10 links
the download); convert it with ``tools/convert_tflite.py`` and pass the
directory containing ``face_embeddings.npz``.

TPU-native: the crop + resize is the same fused warp gather used
everywhere else (an axis-aligned crop is a rotation-free ROI), so crop,
normalize, CNN and the L2 norm compile into one XLA program.

Real-weights validation status: the reference's integration test
(face_embeddings.rs:119-146) embeds russ_cox_1/russ_cox_2 with the
downloadable ArcFace model and checks same-person cosine similarity.
That download
(https://www.digidow.eu/f/datasets/arcface-tensorflowlite/model.tflite,
reference README.md:9-10) is unreachable from this environment (zero
egress; ``curl`` fails with DNS resolution errors — attempted
2026-08-17, retried 2026-08-19 against digidow.eu, github.com and
storage.googleapis.com, all "Could not resolve host"), so semantic
discrimination cannot be asserted here.  A real-weights similarity
test exists and auto-enables the moment a converted model appears
(tests/test_embeddings_arcface.py::
test_real_arcface_same_person_similarity — drop the converted npz in
``tpu_face/data/real/`` or point ``TPU_FACE_ARCFACE_DIR`` at it).  What IS asserted:
the full graph path on a generated MobileFaceNet of the same
architecture class — flatbuffer -> converter -> lowering -> fused
crop+CNN+L2 — matches the TFLite interpreter to <=1e-4 relative
(tests/test_embeddings_arcface.py), and the op set covers
attention-style embedders too (BATCH_MATMUL/TRANSPOSE,
tests/test_batch_matmul.py).  With the real flatbuffer in hand, a user
runs ``tools/convert_tflite.py model.tflite
<dir>/face_embeddings.npz`` and everything downstream is already
exercised.
"""

import enum
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import Graph, build_jax_fn
from ..ops import image as image_ops
from ..types import BBox
from ..utils.image_io import load_image

_DATA_DIR = Path(__file__).resolve().parent.parent / "data"

IMG_SIZE = 112  # reference face_embeddings.rs:20


class FeatureCount(enum.IntEnum):
    """Embedding widths the model family ships in
    (reference face_embeddings.rs:15-18)."""

    FEATURE_128 = 128
    FEATURE_512 = 512


class FaceEmbeddings:
    """Face feature extractor: ``infer(image, bbox)`` -> L2-normalized
    embedding vector (128 or 512 floats)."""

    def __init__(self, model_path: Optional[str] = None,
                 compute_dtype=jnp.float32, warp_method: str = "auto"):
        base = Path(model_path) if model_path else _DATA_DIR
        npz = base / "face_embeddings.npz"
        if not npz.exists():
            raise FileNotFoundError(
                f"converted model not found: {npz} — the embeddings model "
                f"is not bundled (see reference README); download "
                f"face_embeddings.tflite and run tools/convert_tflite.py")
        self.graph = Graph(npz)
        self._net = build_jax_fn(self.graph, compute_dtype=compute_dtype)
        _, self.in_h, self.in_w, _ = self.graph.input_shape
        self._warp = image_ops.resolve_warp_method(warp_method)
        self._jitted = {}

    # ---- the fused device program -------------------------------------

    def _pipeline(self, image_f32, roi_abs):
        """[H,W,3] f32 + (5,) axis-aligned abs ROI -> L2-normalized
        embedding [D]."""
        # the crop is axis-aligned, so the separable two-matmul path is
        # exact wherever the Pallas kernel would be used
        tensor, _ = image_ops.warp_image_to_tensor(
            image_f32, roi_abs, (self.in_w, self.in_h),
            keep_aspect_ratio=False, output_range=(0.0, 1.0),
            method=("separable" if self._warp == "pallas"
                    else self._warp))
        (raw,) = self._net(tensor[None])
        flat = raw.reshape(-1)
        # eps keeps degenerate crops NaN-free (utils.rs:30-33 divides
        # unguarded; real embeddings have norm orders beyond eps, so
        # this is bit-invisible on valid inputs)
        return flat * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(flat)), 1e-12))

    def _get_jitted(self, h, w):
        key = (h, w)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._pipeline)
        return self._jitted[key]

    # ---- host API ------------------------------------------------------

    def infer(self, image, bbox: BBox) -> np.ndarray:
        """Embed the face inside ``bbox`` (absolute pixel coordinates,
        int-truncated like the reference's Mat::roi crop,
        face_embeddings.rs:101-109)."""
        img = load_image(image)
        h, w = img.shape[:2]
        roi_abs = self._roi_from_bbox(bbox)
        out = self._get_jitted(h, w)(jnp.asarray(img), jnp.asarray(roi_abs))
        return np.asarray(out)

    @staticmethod
    def _roi_from_bbox(bb) -> np.ndarray:
        """BBox (or (xmin, ymin, xmax, ymax) tuple) -> axis-aligned
        (5,) abs ROI with the reference's int-truncated crop semantics
        (face_embeddings.rs:101-109)."""
        vals = ((bb.xmin, bb.ymin, bb.xmax, bb.ymax)
                if isinstance(bb, BBox) else tuple(float(v) for v in bb))
        x, y = int(vals[0]), int(vals[1])
        cw, ch = int(vals[2] - vals[0]), int(vals[3] - vals[1])
        if cw <= 0 or ch <= 0:
            raise ValueError(f"empty crop bbox: {vals}")
        return np.array([x + cw / 2.0, y + ch / 2.0, cw, ch, 0.0],
                        np.float32)

    def infer_batch(self, images, bboxes) -> np.ndarray:
        """Batched embeddings: [B, H, W, 3] same-size RGB frames (host
        or device array) + B bboxes (``BBox`` or (xmin, ymin, xmax,
        ymax), absolute pixels) -> [B, D] L2-normalized vectors, the
        whole batch as ONE vmapped XLA program (the reference embeds
        one crop per interpreter call, face_embeddings.rs:46-86)."""
        if not hasattr(images, "shape"):
            images = np.asarray(images)
        b, h, w = images.shape[:3]
        if len(bboxes) != b:
            raise ValueError(f"{b} images but {len(bboxes)} bboxes")
        rois = np.stack([self._roi_from_bbox(bb) for bb in bboxes])
        key = ("batch", h, w)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(jax.vmap(self._pipeline))
        out = self._jitted[key](jnp.asarray(images), jnp.asarray(rois))
        return np.asarray(out)

    def embed_boxes(self, images, boxes, as_numpy: bool = True,
                    layout: str = "hwc"):
        """Embed DEVICE-RESIDENT boxes or landmark sets without a host
        round trip of the coordinates — the video-identification
        hand-off:

        >>> res = tracker.step(frames)              # CascadeResult
        >>> embs = emb.embed_boxes(frames, res.mesh)

        ``boxes`` accepts, per image (with an optional face axis K):
        * ``[..., 2, 2]`` normalized corner rows / ``[..., 4]`` —
          a detection-style bbox (Detection layout rows 0-1);
        * ``[..., N>=3, 3]`` normalized landmarks (e.g. the 468-point
          mesh) — the tight landmark bounding box is reduced INSIDE
          the jitted program.  This is the right video hand-off: on
          TRACKED frames ``res.detection[:2]`` carries the previous
          frame's 1.5x-scaled square mesh ROI, not a tight face bbox,
          so mesh-derived boxes are the crops that stay consistent
          with `infer`/`EmbedCascade`-style tight crops across
          detect and tracked frames.

        ``images``: [B, H, W, 3], or [B, 3, H, W] with
        ``layout="planar"`` (the native-decoder fast path; the
        transpose happens on device).  The crop uses the same traced
        int-truncate + frame-intersect semantics as
        ``pipeline.EmbedCascade`` (ops/geometry.
        crop_roi_from_detection); invalid/degenerate boxes produce
        finite garbage — mask with the caller's validity flags.
        Returns [B, D] (or [B, K, D]); ``as_numpy=False`` keeps the
        result on device (serving loops that feed a gallery matmul
        next shouldn't pay a host round trip per step)."""
        from ..ops.geometry import crop_roi_from_detection

        if not hasattr(images, "shape"):
            images = np.asarray(images)
        if layout not in ("hwc", "planar"):
            raise ValueError(f"layout must be hwc|planar, got {layout}")
        if images.ndim != 4 or images.shape[1 if layout == "planar"
                                            else 3] != 3:
            raise ValueError(
                f"images must be [B, H, W, 3] (or [B, 3, H, W] with "
                f"layout='planar'), got {images.shape}")
        if layout == "planar":
            b, _, h, w = images.shape
        else:
            b, h, w = images.shape[:3]
        boxes = jnp.asarray(boxes)
        from_mesh = boxes.ndim >= 2 and boxes.shape[-1] == 3 \
            and boxes.shape[-2] > 2
        if not from_mesh and boxes.shape[-1] == 4:
            boxes = boxes.reshape(boxes.shape[:-1] + (2, 2))
        if boxes.shape[0] != b:
            raise ValueError(f"{b} images but {boxes.shape[0]} box "
                             f"rows (leading dims must agree)")
        faces_axis = boxes.ndim == 4
        key = ("boxes", h, w, faces_axis, from_mesh, layout)
        if key not in self._jitted:
            def one(img, bx):
                if layout == "planar":
                    img = img.transpose(1, 2, 0)
                if from_mesh:
                    xy = bx[:, :2].astype(jnp.float32)
                    bx = jnp.stack([jnp.min(xy, axis=0),
                                    jnp.max(xy, axis=0)])
                roi_abs, _ = crop_roi_from_detection(bx, (w, h), xp=jnp)
                return self._pipeline(img, roi_abs)

            fn = (jax.vmap(lambda im, bk:
                           jax.vmap(lambda bx: one(im, bx))(bk))
                  if faces_axis else jax.vmap(one))
            self._jitted[key] = jax.jit(fn)
        out = self._jitted[key](jnp.asarray(images), boxes)
        return np.asarray(out) if as_numpy else out

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
        return flat / jnp.sqrt(jnp.sum(jnp.square(flat)))

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
        x = int(bbox.xmin)
        y = int(bbox.ymin)
        cw = int(bbox.xmax - bbox.xmin)
        ch = int(bbox.ymax - bbox.ymin)
        if cw <= 0 or ch <= 0:
            raise ValueError(f"empty crop bbox: {bbox}")
        roi_abs = np.array([x + cw / 2.0, y + ch / 2.0, cw, ch, 0.0],
                           np.float32)
        out = self._get_jitted(h, w)(jnp.asarray(img), jnp.asarray(roi_abs))
        return np.asarray(out)

"""tpu_face: TPU-native (JAX/XLA/Pallas) rebuild of the MediaPipe face
pipeline with the capabilities of ``okieraised/rs-face-detection-tflite``.

Face detection (BlazeFace, 5 variants), 468-point face mesh, iris
landmarks, face embeddings, rendering — with the networks reimplemented as
jitted XLA programs (weights extracted offline from the reference's
.tflite flatbuffers) and all pre/post-processing fused on device.
"""

from . import models, render
from .types import BBox, Detection, ImageTensor, Landmark, Rect

__version__ = "0.3.4"

__all__ = ["BBox", "Detection", "ImageTensor", "Landmark", "Rect",
           "models", "render"]

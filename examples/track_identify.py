#!/usr/bin/env python
"""Video identification: track faces across streams AND embed each
tracked face per frame.

The tracker's detector-free loop produces per-stream face boxes on
device; ``FaceEmbeddings.embed_boxes`` consumes them (and the same
device-resident frames) without a host round trip of the coordinates,
so re-identification embeddings ride alongside the tracking loop —
e.g. to match tracked identities against a gallery every frame.

Runs on the bundled demo embeddings graph (synthetic weights, see
tpu_face/data/demo/README.md); similarities printed here show
track-consistency of the pipeline, not real identity semantics.

    python examples/track_identify.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tpu_face.models import FaceEmbeddings
from tpu_face.models.face_detection import FaceDetectionModel
from tpu_face.tracking import FaceTracker
from tpu_face.utils.image_io import load_image


def main():
    img = load_image("/root/reference/test_data/man.jpg")
    frames = [np.roll(np.roll(img, 4 * i, axis=1), 2 * i, axis=0)
              for i in range(6)]

    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    demo = Path(__file__).resolve().parent.parent / "tpu_face/data/demo"
    emb = FaceEmbeddings(model_path=str(demo))

    prev = None
    for i, frame in enumerate(frames):
        res = tracker.step(frame[None])
        valid = bool(np.asarray(res.mesh_valid)[0])
        # mesh-derived crops: tight and CONSISTENT across detect and
        # tracked frames (on tracked frames the detection rows carry
        # the previous frame's 1.5x mesh ROI, not a tight bbox)
        vec = emb.embed_boxes(frame[None], res.mesh)[0]
        drift = "" if prev is None else \
            f"  cos(prev)={float(vec @ prev):+.4f}"
        mode = "tracked" if i else "detect "
        print(f"frame {i}: {mode} valid={valid} |v|="
              f"{float(np.linalg.norm(vec)):.4f}{drift}")
        prev = vec


if __name__ == "__main__":
    main()

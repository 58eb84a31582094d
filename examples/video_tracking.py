#!/usr/bin/env python
"""Video tracking demo: the detector runs only when tracking is lost.

Simulates a panning video from man.jpg, steps the FaceTracker through
it, injects a dropout frame to show loss + re-detection, and reports
which frames tracked.

    python examples/video_tracking.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tpu_face.models.face_detection import FaceDetectionModel
from tpu_face.tracking import FaceTracker
from tpu_face.utils.image_io import load_image


def main():
    img = load_image("/root/reference/test_data/man.jpg")
    frames = [np.roll(np.roll(img, 4 * i, axis=1), 2 * i, axis=0)
              for i in range(8)]
    frames[5] = np.zeros_like(img)  # dropout frame

    # smoothing="one_euro": OneEuro temporal filter on the output
    # landmarks (raw tracking dynamics unchanged; smoothing.py)
    tracker = FaceTracker(FaceDetectionModel.BACK_CAMERA,
                          smoothing="one_euro")
    for i, frame in enumerate(frames):
        was_tracking = bool(tracker.tracking.all()) \
            if tracker.tracking.size else False
        res = tracker.step(frame)
        valid = bool(np.asarray(res.mesh_valid[0]))
        nose = np.asarray(res.mesh[0][1]) * [540, 360, 540]
        mode = "tracked " if was_tracking else "detected"
        print(f"frame {i}: {mode} valid={valid} "
              f"nose=({nose[0]:.1f}, {nose[1]:.1f})")


if __name__ == "__main__":
    main()

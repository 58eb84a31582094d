#!/usr/bin/env python
"""The full fused cascade + rendering: detect -> mesh -> irises on one
image, writing annotated PNGs (the TPU-native version of the reference's
integration test, lib.rs:18-84); run:

    python examples/full_cascade.py [image.jpg] [outdir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



import numpy as np
from PIL import Image

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceLandmark, IrisLandmark,
                             eye_landmarks_to_render_data,
                             face_detection_to_roi,
                             face_landmarks_to_render_data,
                             iris_roi_from_face_landmarks)
from tpu_face.render import Colors, detections_to_render_data, \
    render_to_image


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test_data/man.jpg"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else ".")
    img = np.asarray(Image.open(path).convert("RGB"))
    h, w = img.shape[:2]

    faces = FaceDetection(FaceDetectionModel.BACK_CAMERA).infer(path)
    if not faces:
        print("no faces detected!")
        return
    roi = face_detection_to_roi(faces[0], (w, h))
    mesh = FaceLandmark().infer(path, roi)
    left_roi, right_roi = iris_roi_from_face_landmarks(mesh, (w, h))
    iris = IrisLandmark()
    left = iris.infer(path, left_roi)
    right = iris.infer(path, right_roi, is_right_eye=True)

    anns = detections_to_render_data(faces, bounds_color=Colors.GREEN,
                                     line_width=4)
    render_to_image(anns, img).save(outdir / "out_bbox.png")

    anns = face_landmarks_to_render_data(mesh, Colors.RED, Colors.RED)
    render_to_image(anns, img).save(outdir / "out_landmark.png")

    anns = eye_landmarks_to_render_data(right.eyeball_contour(),
                                        Colors.RED, Colors.RED)
    anns = eye_landmarks_to_render_data(left.eyeball_contour(),
                                        Colors.RED, Colors.RED,
                                        output=anns)
    render_to_image(anns, img).save(outdir / "out_iris.png")
    print(f"wrote out_bbox.png, out_landmark.png, out_iris.png to "
          f"{outdir.resolve()}")


if __name__ == "__main__":
    main()

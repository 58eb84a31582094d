#!/usr/bin/env python
"""Detect a face, derive its ROI and print 468 mesh landmarks.

Working equivalent of the reference's examples/face_landmark.rs (stale
there — SURVEY.md §2.2.11); run:

    python examples/face_landmark.py [image.jpg]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from PIL import Image

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceLandmark, face_detection_to_roi)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test_data/man.jpg"
    w, h = Image.open(path).size

    detector = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    faces = detector.infer(path)
    if not faces:
        print("no faces detected!")
        return
    roi = face_detection_to_roi(faces[0], (w, h))
    landmarks = FaceLandmark().infer(path, roi)
    print(f"{len(landmarks)} landmarks; nose tip at "
          f"({landmarks[1].x * w:.2f}, {landmarks[1].y * h:.2f}) px")


if __name__ == "__main__":
    main()

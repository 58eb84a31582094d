#!/usr/bin/env python
"""Detect faces in an image and print the results.

Working equivalent of the reference's examples/face_detection.rs (which
is stale there — SURVEY.md §2.2.11); run:

    python examples/face_detection.py [image.jpg]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from tpu_face.models import FaceDetection, FaceDetectionModel


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test_data/man.jpg"
    detector = FaceDetection(FaceDetectionModel.BACK_CAMERA)
    faces = detector.infer(path)
    if not faces:
        print("no faces detected!")
        return
    for face in faces:
        print(face)


if __name__ == "__main__":
    main()

from .face_detection import FaceDetection, FaceDetectionModel, FaceIndex

__all__ = ["FaceDetection", "FaceDetectionModel", "FaceIndex"]

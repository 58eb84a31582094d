from .face_detection import FaceDetection, FaceDetectionModel, FaceIndex
from .face_embeddings import FaceEmbeddings, FeatureCount
from .face_landmark import (FACE_LANDMARK_CONNECTIONS, FaceLandmark,
                            face_detection_to_roi,
                            face_landmarks_to_render_data)
from .iris_landmark import (EYE_LANDMARK_CONNECTIONS, IrisIndex,
                            IrisLandmark, IrisResults,
                            eye_landmarks_to_render_data, get_iris_depth,
                            get_iris_diameter, iris_landmarks_to_render_data,
                            iris_roi_from_face_landmarks,
                            update_face_landmarks_with_iris_results)

__all__ = [
    "FaceDetection", "FaceDetectionModel", "FaceIndex",
    "FaceLandmark", "face_detection_to_roi", "FACE_LANDMARK_CONNECTIONS",
    "face_landmarks_to_render_data",
    "IrisLandmark", "IrisResults", "IrisIndex",
    "iris_roi_from_face_landmarks",
    "update_face_landmarks_with_iris_results",
    "get_iris_diameter", "get_iris_depth",
    "eye_landmarks_to_render_data", "iris_landmarks_to_render_data",
    "EYE_LANDMARK_CONNECTIONS",
    "FaceEmbeddings", "FeatureCount",
]

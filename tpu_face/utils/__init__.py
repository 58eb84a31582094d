from .image_io import l2_norm, load_image, similarity_score

__all__ = ["l2_norm", "load_image", "similarity_score"]

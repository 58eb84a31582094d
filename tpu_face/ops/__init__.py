from . import anchors, geometry, image, postprocess

__all__ = ["anchors", "geometry", "image", "postprocess"]

from .extract import SurfParams, extract_keypoints

__all__ = ["SurfParams", "extract_keypoints"]

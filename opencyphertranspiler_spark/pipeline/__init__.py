from . import dedup, multimodal, similarity, sketches, skew, text

__all__ = ["dedup", "multimodal", "similarity", "sketches", "skew", "text"]

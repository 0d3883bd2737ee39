from . import dedup, multimodal, sampling, similarity, sketch, text

__all__ = ["dedup", "multimodal", "sampling", "similarity", "sketch", "text"]

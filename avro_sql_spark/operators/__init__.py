from . import dedup, multimodal, relational, similarity, text

__all__ = ["relational", "dedup", "similarity", "text", "multimodal"]

from . import curation, dedup, multimodal, relational, similarity, text

__all__ = ["relational", "curation", "dedup", "similarity", "text", "multimodal"]

from . import curation, dedup, layout, multimodal, profile, relational, similarity, text

__all__ = [
    "relational",
    "curation",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "layout",
    "profile",
]

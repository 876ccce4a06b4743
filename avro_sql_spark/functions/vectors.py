"""Vector column helpers for embedding similarity (array<float|double>).

All JVM-side (``aggregate``/``zip_with``): the dot product and norms are
sequential folds, so results are bit-deterministic for a given element
order — which lets the DuckDB oracle reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda v: (v.cast("double") / n))

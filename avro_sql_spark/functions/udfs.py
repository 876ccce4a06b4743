"""User-defined function surface (SURVEY.md §2.2 'UDF/UDAF/UDTF') —
reserved in the reference, first-class here.

Policy: the hot path never uses row-at-a-time Python UDFs. When Python
is genuinely needed (models, codecs), it enters as an Arrow-batched
``pandas_udf`` (columnar transfer, ~10-100× over per-row) or a
``mapInPandas`` iterator (see operators.multimodal). Python UDTFs
(Spark 3.5+) cover one-row→many-rows expansion with table semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


@pandas_udf(ArrayType(DoubleType()))
def normalize_embedding(v: pd.Series) -> pd.Series:
    """L2-normalize an embedding column, Arrow-batched: each batch is a
    Series of lists; numpy does the math columnar-side."""
    import numpy as np

    def norm_one(vec):
        if vec is None:
            return None
        a = np.asarray(vec, dtype="float64")
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0.0 else a.tolist()

    return v.map(norm_one)


@pandas_udf(DoubleType())
def batch_quality_model(text: pd.Series) -> pd.Series:
    """Stand-in for an ML quality model: deterministic feature mix,
    showing the shape a real (e.g. fasttext/transformer) scorer takes —
    load model once per worker, score a whole Arrow batch per call."""
    lengths = text.str.len().astype("float64")
    uppers = text.str.count(r"[A-Z]").astype("float64")
    return (1.0 / (1.0 + (uppers / lengths.clip(lower=1.0)))).astype("float64")


class ShingleUDTF:
    """Python UDTF (Spark 3.5+): one document row → one row per word
    shingle. Registered via ``register_udtfs``; the Column-expression
    version in functions.text is preferred in the hot path — this is the
    escape hatch shape for logic that can't be a Column tree."""

    def eval(self, doc_id: int, text: str, n: int = 3):
        if text is None:
            return
        words = text.lower().split(" ")
        seen = set()
        for i in range(len(words) - n + 1):
            s = " ".join(words[i : i + n])
            if s not in seen:
                seen.add(s)
                yield (doc_id, s)


def register_udtfs(spark) -> None:
    from pyspark.sql.functions import udtf

    shingles = udtf(ShingleUDTF, returnType="doc_id: long, shingle: string")
    spark.udtf.register("word_shingles_udtf", shingles)

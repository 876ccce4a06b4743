"""Document-level text analysis operators (DataFrame in → DataFrame out)
wrapping the Column functions in :mod:`avro_sql_spark.functions.text`."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def analyze_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-scan text profile: token counts, punctuation/stopword ratios,
    language guess, quality score, fingerprint. All codegen'd Column
    expressions — the scan cost IS the operator cost at 100 TB."""
    t = F.col(text_col)
    # repartition first: a compacted single-file input would pin all the
    # string work to one core (same rationale + explicit-count caveat as
    # dedup._spread: AQE would coalesce a bare repartition(col) back)
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    return docs.select(
        F.col(id_col),
        T.whitespace_token_count(t).cast("long").alias("n_tokens_ws"),
        T.regex_token_count(t).cast("long").alias("n_tokens_re"),
        T.punct_ratio(t).alias("punct_ratio"),
        T.stopword_ratio(t).alias("stopword_ratio"),
        T.lang_id(t).alias("lang_guess"),
        T.quality_score(t).alias("quality"),
        T.fingerprint(t).alias("fp"),
    )

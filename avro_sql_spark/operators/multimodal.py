"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with a typed metadata struct (north-star scope; absent in the reference).

The Spark-side plumbing is real and tested — schema convention, Arrow
batch shape, ``mapInPandas`` feature extraction, partition sizing. The
actual codec decode is STUBBED (the image/audio libraries are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder stands in so
the distributed plumbing can be exercised end-to-end.

Schema convention:
    payload  BINARY                  -- the raw media bytes
    media    STRUCT<kind: STRING, mime: STRING, width: INT, height: INT,
                    duration_ms: BIGINT>

At 100 TB: payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` small enough that one Arrow batch
of payloads fits executor memory, and always project metadata-only
queries BEFORE touching payload (nested pruning skips the bytes)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payload derived from the text column — stands
    in for real media bytes so the binary-column plumbing is testable."""
    return docs.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media",
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/fake").alias("mime"),
            (F.octet_length(F.col(text_col)) % 1920).cast("int").alias("width"),
            (F.octet_length(F.col(text_col)) % 1080).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload. STUB: real codecs (PIL/opencv) are not
    available in this environment."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not present in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: 'pixels' are the byte histogram
    hist = [0] * 8
    for b in payload:
        hist[b % 8] += 1
    return hist


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_checksum", LongType(), False),
        StructField("hist_0", LongType(), False),
    ]
)


def extract_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the pattern for any decode/resize/frame-sample op.
    Python touches each payload once per batch; no per-row round trips."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def checksum(b: bytes) -> int:
            # numpy byte view — a Python sum() loop over payload bytes is
            # ~50× slower and dominated the whole operator
            return int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)) % 1_000_003

        def hist0(b: bytes) -> int:
            arr = np.frombuffer(b, dtype=np.uint8)
            return int(np.count_nonzero(arr % 8 == 0))

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "byte_checksum": payloads.map(checksum),
                    "hist_0": payloads.map(hist0),
                }
            )

    # repartition so Arrow batches spread across cores even when the
    # source is one compacted file (explicit count — AQE would coalesce)
    # NULL payloads are dropped at the plan level: len(None)/frombuffer
    # (None) would kill the Python worker, and a null medium has no
    # features to extract
    n = media_df.sparkSession.sparkContext.defaultParallelism
    return (
        media_df.select(id_col, "payload")
        .filter(F.col("payload").isNotNull())
        .repartition(n, F.col(id_col))
        .mapInPandas(_extract, FEATURE_SCHEMA)
    )


def payload_sizes(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata-only profile — stays entirely JVM-side (octet_length), and
    with parquet nested pruning never reads the payload bytes."""
    return media_df.select(
        F.col(id_col),
        F.octet_length("payload").alias("n_bytes"),
        F.col("media.kind").alias("kind"),
        F.col("media.width").alias("width"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_images(
    media_df: DataFrame, width: int = 32, height: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """Resize pass over image payloads via ``mapInPandas``. The real
    resample (PIL/opencv) is STUBBED with a deterministic stand-in —
    nearest-neighbor over the raw byte grid, so output size is exactly
    width*height and reruns agree byte-for-byte — but the Spark shape is
    the production one: Arrow batches in, fixed-size payloads out, and
    the output schema carries the new dimensions so downstream metadata
    queries never re-read the bytes."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height

        def fake_resample(b: bytes) -> bytes:
            arr = np.frombuffer(b, dtype=np.uint8)
            if arr.size == 0:
                return bytes(target)
            # nearest-neighbor index map — deterministic, shape-true
            idx = (np.arange(target) * arr.size) // target
            return arr[idx].tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pdf["payload"].map(fake_resample),
                    "width": width,
                    "height": height,
                }
            )

    n = media_df.sparkSession.sparkContext.defaultParallelism
    return (
        media_df.select(id_col, "payload")
        .filter(F.col("payload").isNotNull())  # see extract_features
        .repartition(n, F.col(id_col))
        .mapInPandas(_resize, RESIZED_SCHEMA)
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(
    media_df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling for video payloads: treat the payload as a run of
    fixed-size frames and emit every ``every_n``-th one as its own row —
    the 1→N explode shape every video pipeline needs. Real demuxing
    (ffmpeg) is STUBBED by the fixed-stride split; the distributed
    mechanics (Arrow batches, row multiplication inside the worker, tall
    output schema) are the production ones."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    n = media_df.sparkSession.sparkContext.defaultParallelism
    return (
        media_df.select(id_col, "payload")
        .filter(F.col("payload").isNotNull())  # see extract_features
        .repartition(n, F.col(id_col))
        .mapInPandas(_sample, FRAME_SCHEMA)
    )


def payload_dedup_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact dedup audit for binary media payloads — the first pass of
    every multimodal ingest (image/audio corpora are 30-50% byte-exact
    duplicates; dedup BEFORE decode saves the GPU fleet, not after):
    per media kind, payload count, distinct-content count (md5 of the
    raw bytes — content-addressed, the CAS key), duplicate rate, and
    the bytes a content-addressed store reclaims
    (Σ (copies-1)·size per distinct payload).

    One groupBy on (kind, md5) then one on kind — integer sums only,
    hash-exact in any engine. The md5 runs on the BYTES (not a decoded
    form), so the audit works for any codec including ones this
    environment can't decode."""
    per_content = (
        media.select(
            F.col("media.kind").alias("kind"),
            F.md5(F.col(payload_col)).alias("h"),
            F.octet_length(F.col(payload_col)).alias("sz"),
        )
        .groupBy("kind", "h")
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("sz").alias("sz"),
        )
    )
    return (
        per_content.groupBy("kind")
        .agg(
            F.sum("copies").alias("n_payloads"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("copies") * F.col("sz")).alias("total_bytes"),
            F.sum((F.col("copies") - 1) * F.col("sz")).alias("reclaimable_bytes"),
        )
        .select(
            "kind",
            F.col("n_payloads").cast("bigint").alias("n_payloads"),
            "n_distinct",
            F.round(
                (F.col("n_payloads") - F.col("n_distinct"))
                / F.col("n_payloads").cast("double"),
                6,
            ).alias("dup_rate"),
            F.col("total_bytes").cast("bigint").alias("total_bytes"),
            F.col("reclaimable_bytes").cast("bigint").alias("reclaimable_bytes"),
        )
        .orderBy("kind")
    )

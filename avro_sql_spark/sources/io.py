"""Batch sources and sinks (SURVEY.md §2.2 'Scans / sources / sinks' —
the reference has none; IO is the host's job there. Here the engine owns
it via Spark's datasource API).

Formats: parquet / json / csv / orc are always available. Avro uses the
spark-avro jar when present (the distributed 100 TB path); without the
jar it transparently falls back to the pure-Python container codec
(avro_io.py — driver-side, development/small-data). Kafka requires
spark-sql-kafka and stays feature-gated. The Avro *schema* layer
(avro_schema.py) works in every configuration.

Scale defaults: writers repartition to sane file counts and always go
through a deterministic column order; readers never infer schemas on
CSV/JSON unless asked (schema inference scans data twice at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..errors import AvroSqlError

_BUILTIN = {"parquet", "json", "csv", "orc"}


def _avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # missing jar raises FAILED_TO_LOAD_DATA_SOURCE/ClassNotFound;
        # missing path means the format itself resolved fine
        return "Failed to find" not in msg and "FAILED_TO_FIND_DATA_SOURCE" not in msg
    return True


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """Read a table. For csv/json pass an explicit ``schema`` in
    production — inference is a full extra pass over the data."""
    fmt = fmt.lower()
    if fmt == "avro" and not _avro_available(spark):
        # jar-less fallback: pure-Python container decode on the driver
        # (avro_io.py) — development/small-data path, same sidecar schema
        from .avro_io import read_avro_fallback

        reader_schema = None
        if "avroSchema" in options:
            # the jar path's reader-schema option: spec Schema
            # Resolution (avro_resolve.py) gives the fallback the same
            # semantics — promotions, reader defaults, field discard
            import json as _json

            reader_schema = _json.loads(options.pop("avroSchema"))
        if options:
            raise AvroSqlError(
                "avro reader options require the spark-avro jar "
                f"(jar-less fallback got: {sorted(options)})"
            )
        df = read_avro_fallback(spark, path, reader_schema=reader_schema)
        if schema is not None:
            # honor the caller's schema contract like every other path:
            # project + cast to the requested columns/types (missing
            # columns or impossible casts fail loudly, not silently)
            from pyspark.sql import functions as F

            df = df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
            )
        return df
    if fmt not in _BUILTIN and fmt != "avro":
        raise AvroSqlError(f"Unsupported source format: {fmt}")
    reader = spark.read.format(fmt).options(**options)
    if fmt == "csv" and "header" not in options:
        # write_table always emits a header line: skip it on read even
        # when the caller supplies the schema (otherwise the header
        # parses as a data row of nulls/strings)
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    **options,
) -> None:
    """Write a table. ``partition_by`` gives directory-partition pruning
    to downstream readers; ``target_files`` coalesces small outputs (the
    small-files problem is the classic 100 TB sink failure)."""
    fmt = fmt.lower()
    if fmt == "avro" and not _avro_available(df.sparkSession):
        # jar-less fallback: single-container-file write via toLocalIterator
        if partition_by:
            raise AvroSqlError(
                "partition_by with avro needs the spark-avro jar "
                "(the jar-less fallback writes one container file)"
            )
        # honor mode semantics instead of silently truncating: the
        # fallback writes one fresh container, so only overwrite (and
        # the existence-gated modes) are expressible without the jar
        import os

        exists = os.path.exists(path)
        if mode == "error" and exists:
            raise AvroSqlError(f"path exists and mode='error': {path}")
        if mode == "ignore" and exists:
            return
        if mode == "append" and exists:
            raise AvroSqlError(
                "mode='append' on an existing avro file requires the "
                "spark-avro jar (the jar-less fallback rewrites the "
                "whole container)"
            )
        if options:
            raise AvroSqlError(
                "avro writer options require the spark-avro jar "
                f"(jar-less fallback got: {sorted(options)})"
            )
        from .avro_io import write_avro_fallback

        write_avro_fallback(df, path)
        return
    if target_files is not None:
        df = df.coalesce(target_files)
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    fmt: str = "parquet",
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction: rewrite ``src_path`` into
    ``ceil(total_bytes / target_file_mb)`` files at ``dst_path`` and
    return that file count. The small-files problem is the classic
    sink failure at scale — a streaming job or over-parallel writer
    leaves thousands of KB-sized files, and every downstream scan pays
    a per-file open/footer cost that dwarfs the read.

    Sizing uses the filesystem (Hadoop FS through the JVM — works for
    any scheme Spark can read), not a data scan. The rewrite itself is
    one coalesce (no shuffle: tasks just read multiple input files
    each). Writing to a NEW path is deliberate: atomic in-place swap is
    a table-format feature (Delta/Iceberg rewrite); on raw directories
    the caller owns the rename."""
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total_bytes = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = read_table(spark, src_path, fmt)
    # coalesce can only DECREASE partition count: a non-splittable
    # source (one gzipped json, say) may read as fewer partitions than
    # n_files — report what will actually be written, don't shuffle
    # just to hit the byte target
    n_out = min(n_files, df.rdd.getNumPartitions())
    df.coalesce(n_out).write.format(fmt).mode("overwrite").save(dst_path)
    return n_out

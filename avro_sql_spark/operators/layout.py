"""Data-layout operators: Z-order clustering for multi-column scan
pruning (SURVEY.md §2.2 'Scans / sources / sinks' — write-side layout).

At 100 TB the scan is won or lost at WRITE time: parquet keeps per-file
and per-row-group min/max stats, and a reader's predicate prunes a file
only if the file's value range excludes the predicate. Sorting by one
column gives perfect pruning on that column and none on others;
interleaving the bits of several columns (a Morton / Z-order curve, the
standard lakehouse OPTIMIZE ZORDER BY technique) gives good pruning on
ALL of them simultaneously.

Everything here is Column arithmetic (shiftleft / shiftright / bitwise
AND-OR) — JVM-side, codegen-friendly, no UDFs. The only extra pass is
one tiny min/max aggregate to scale each column into the curve domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-value of ``cols``: bit b of column i lands at output bit
    ``b * len(cols) + i``. Inputs must already be non-negative ints
    < 2**bits. Total output bits = bits * len(cols) (keep <= 63)."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits * n_cols = {bits * n} exceeds a signed long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def zvalue(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-value Column for ``df`` rows over ``cols``: each column is
    min/max scaled into [0, 2**bits) using one tiny stats aggregate
    (collected once at plan time — a driver action on a scalar row, the
    same footprint as ``approxQuantile``), then bit-interleaved. NULL
    in any column maps to curve position 0 (sorts first)."""
    stats_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats_row[f"mn_{c}"], stats_row[f"mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        s = F.floor(
            (F.col(c).cast("double") - F.lit(mn if mn is not None else 0.0))
            / F.lit(span)
            * F.lit(float(top))
        ).cast("long")
        scaled.append(F.coalesce(F.least(F.greatest(s, F.lit(0)), F.lit(top)), F.lit(0)))
    return interleave_bits(scaled, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``cols``:
    range-repartition on the z-value (contiguous curve segments per
    file — this is what localizes each column's value range per file)
    then sort within partitions so row groups inside a file stay tight.
    Downstream range predicates on ANY of ``cols`` then prune files via
    parquet min/max stats. ``num_files`` defaults to the current
    shuffle parallelism."""
    z = zvalue(df, cols, bits).alias("__z")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )

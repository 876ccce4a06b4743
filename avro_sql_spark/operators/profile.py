"""Table profiling (ANALYZE-style column statistics) — the pre-flight
report a pipeline runs before pointing 1000 executors at a new dataset:
null rates, cardinalities, and value ranges per column, from ONE pass
over the data.

Two variants share a plan shape (single scan, one global aggregate with
map-side partials, output unpivoted to a row per column):

- :func:`profile_table` uses EXACT ``count(distinct)`` — the oracle-
  checkable contract, fine up to mid-size tables (each distinct adds an
  Expand pass over the scan output).
- :func:`profile_table_approx` swaps in ``approx_count_distinct`` HLL
  sketches — fixed-size mergeable state per column, the 100 TB path
  (exact multi-column distinct at that scale is several full shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats_exprs(cols: list[str], approx: bool) -> list:
    out = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        out.append(F.count(col).alias(f"nn_{c}"))
        if approx:
            out.append(F.approx_count_distinct(col, rsd=0.02).alias(f"nd_{c}"))
        else:
            out.append(F.countDistinct(col).alias(f"nd_{c}"))
        out.append(F.min(col).cast("string").alias(f"mn_{c}"))
        out.append(F.max(col).cast("string").alias(f"mx_{c}"))
    return out


def _unpivot(wide: DataFrame, cols: list[str]) -> DataFrame:
    """One output row per profiled column: stack the flat aggregate via
    an in-row array-of-structs explode (no extra shuffle — the aggregate
    result is a single row)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_value"),
                F.col(f"mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(entries).alias("e"))
        .select("e.*")
        .orderBy("column")
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per column, min/max as strings so
    heterogeneous column types share one output schema."""
    cols = cols or df.columns
    return _unpivot(df.agg(*_stats_exprs(cols, approx=False)), cols)


def profile_table_approx(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """HLL-sketch variant of :func:`profile_table` — one pass, fixed
    aggregation state per column regardless of cardinality."""
    cols = cols or df.columns
    return _unpivot(df.agg(*_stats_exprs(cols, approx=True)), cols)


def expectations_report(
    df: DataFrame, checks: "list[tuple[str, Column]]"
) -> DataFrame:
    """dbt-test-style data-quality expectations in ONE scan: each check
    is (name, boolean Column that is True when the row VIOLATES the
    expectation); the report is one row per check with the violation
    count and rate. Conditional-sum aggregates all fuse into a single
    partial+final pair over a single pass — N checks cost one scan, not
    N scans (the trap naive test runners fall into at 100 TB).
    """
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(cond.cast("long")).alias(f"_v{i}")
            for i, (_, cond) in enumerate(checks)
        ],
    )
    names = F.array(*[F.lit(name) for name, _ in checks])
    viols = F.array(*[F.col(f"_v{i}") for i in range(len(checks))])
    return (
        agg.select(
            F.col("_n"),
            F.posexplode(F.arrays_zip(names.alias("check"), viols.alias("violations"))).alias(
                "idx", "z"
            ),
        )
        .select(
            F.col("z.check").alias("check"),
            F.col("z.violations").alias("n_violations"),
            F.col("_n").alias("n_rows"),
            F.round(F.col("z.violations") / F.col("_n"), 9).alias("violation_rate"),
            (F.col("z.violations") == 0).alias("passed"),
        )
        .orderBy("check")
    )

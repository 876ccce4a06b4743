"""Bucketed tables — the shuffle-free co-located join path (the 100 TB
answer to repeated fact-fact joins on the same key).

``spark.read.parquet`` can't know two datasets share a partitioning;
bucketed *tables* (metastore-backed) can: both sides bucketed on the
join key with the same bucket count join with NO Exchange on either
side. Use for the canonical join keys of a warehouse (orderkey,
custkey): pay one clustered write, then every downstream join skips its
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally enables merge-join without a
    sort step."""
    if mode == "overwrite":
        # an in-memory catalog forgets managed tables between sessions but
        # leaves their directories — clear both or saveAsTable refuses
        # with LOCATION_ALREADY_EXISTS
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        if warehouse:
            import shutil

            # managed-table layout: unqualified -> <wh>/<table>;
            # qualified db.table -> <wh>/<db>.db/<table>, EXCEPT the
            # default database, which stores at <wh>/<table> directly
            if "." in table:
                db, _, name = table.lower().rpartition(".")
                rel = name if db == "default" else f"{db}.db/{name}"
            else:
                rel = table.lower()
            shutil.rmtree(f"{warehouse.rstrip('/')}/{rel}", ignore_errors=True)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two bucketed tables on their bucket key — Catalyst elides
    both Exchanges when bucket specs line up."""
    return spark.table(left).join(spark.table(right), on)

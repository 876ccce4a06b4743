"""Join strategy utilities beyond Catalyst's defaults (SURVEY.md §2.2
'Joins'): explicit salting for skewed keys, and a guarded broadcast.

AQE's skew-join handles *shuffle-partition* skew at runtime; salting is
for the harder case — a single join KEY so hot that one task would
receive it all (classic at 100 TB: null-ish default ids, bot users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``big``'s hot keys are split across
    ``salt_buckets`` tasks: big side gets a random-ish (hash-derived,
    deterministic) salt, small side is replicated once per bucket, and
    the join key becomes (key, salt). Row multiplicity is unchanged —
    each big row matches exactly one replica of its key."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_salted = big.withColumn("_salt", salt.cast("int"))
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def broadcast_if_small(df: DataFrame, max_rows: int = 1_000_000) -> DataFrame:
    """Broadcast hint guarded by a cheap count — for dimension tables of
    unknown size in generic pipelines. (On a real deployment prefer
    statistics / AQE; the explicit hint is for when stats are missing.)"""
    n = df.limit(max_rows + 1).count()
    return F.broadcast(df) if n <= max_rows else df

def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution-style fuzzy matching: pairs of rows whose
    ``name_col`` values are within ``max_distance`` Levenshtein edits,
    restricted to rows sharing ``block_cols`` (the classic blocking-key
    trick). Returns (id_a, id_b, name_a, name_b, distance), id_a < id_b.

    Scale shape: an UNBLOCKED fuzzy join is O(n^2) and impossible at
    100 TB; blocking turns it into an equi-join on the block key, so the
    shuffle is one hash exchange per side and the quadratic cost applies
    only within a block (choose block keys so blocks stay ~1e3-1e4
    rows; add a length bucket or name prefix to split hot blocks — same
    skew reasoning as :func:`salted_join`). The Levenshtein filter runs
    JVM-side inside codegen, never in Python."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    keys = [f"_bk{i}" for i in range(len(block_cols))]
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )

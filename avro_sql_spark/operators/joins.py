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

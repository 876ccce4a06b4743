"""Join-strategy utility tests."""

from pyspark.sql import functions as F

from avro_sql_spark.operators.joins import broadcast_if_small, salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k LONG, payload LONG"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "a"), (30, "b")], "k LONG, name STRING")
    expected = big.join(small, "k").count()
    salted = salted_join(big, small, "k")
    assert salted.count() == expected
    assert set(salted.columns) == {"k", "payload", "name"}
    # row multiplicity preserved for the hot key
    hot = salted.filter(F.col("k") == 1).count()
    assert hot == big.filter(F.col("k") == 1).count()


def test_salted_join_left(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k LONG, v LONG")
    small = spark.createDataFrame([(1, "x")], "k LONG, s STRING")
    out = salted_join(big, small, "k", how="left").orderBy("k").collect()
    assert [(r["k"], r["s"]) for r in out] == [(1, "x"), (2, None), (9, None)]


def test_broadcast_if_small(spark):
    small = spark.range(10)
    hinted = broadcast_if_small(small, max_rows=100)
    big = spark.range(10000).withColumnRenamed("id", "id2")
    plan = big.join(hinted, big.id2 == hinted.id)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_blocked_fuzzy_pairs_blocks_and_bounds(spark):
    """Only same-block pairs may appear, each unordered pair once, and
    the distance bound is honored; cross-block near-identical names must
    NOT match (that is the documented blocking tradeoff)."""
    from avro_sql_spark.operators.joins import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget", "A"),
            (2, "red widgef", "A"),   # 1 edit, same block
            (3, "red widget", "B"),   # identical name, other block
            (4, "blue bolt", "A"),    # same block, far away
        ],
        ["id", "name", "blk"],
    )
    rows = blocked_fuzzy_pairs(df, "id", "name", ["blk"], max_distance=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in rows}
    assert pairs == {(1, 2): 1}


def test_blocked_fuzzy_pairs_is_equi_join(spark):
    """The block key must plan as an equi-join (hash/broadcast), never a
    cartesian product."""
    from avro_sql_spark.operators.joins import blocked_fuzzy_pairs

    df = spark.createDataFrame([(1, "x", "A"), (2, "y", "B")], ["id", "name", "blk"])
    plan = blocked_fuzzy_pairs(df, "id", "name", ["blk"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

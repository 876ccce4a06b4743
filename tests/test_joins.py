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

"""Plan-quality assertions: the scale guarantees are properties of the
physical plan, so test the plan (SURVEY.md §4.3 / the 100 TB design
rules), not just the results."""

import pytest
from pyspark.sql import functions as F

from avro_sql_spark import reshape
from avro_sql_spark.operators import relational


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def parquet_person(spark, tmp_path_factory):
    from tests.conftest import PERSON_ROW, PERSON_SCHEMA

    path = str(tmp_path_factory.mktemp("plans") / "person")
    spark.createDataFrame([PERSON_ROW] * 100, PERSON_SCHEMA).write.parquet(path)
    return spark.read.parquet(path)


def test_reshape_is_single_project(parquet_person):
    out = reshape(parquet_person, "SELECT name, address.street.name as sn")
    plan = _plan(out)
    assert "Exchange" not in plan  # no shuffle for a projection
    assert plan.count("Project") == 1


def test_reshape_prunes_nested_schema(parquet_person):
    """Nested-schema pruning: selecting one leaf must not read the whole
    address struct from parquet."""
    out = reshape(parquet_person, "SELECT address.street.name as sn")
    plan = _plan(out)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "street" in read_schema
    assert "zip" not in read_schema  # unselected siblings pruned at the scan


def test_filter_pushdown_reaches_scan(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pushdown") / "t")
    spark.range(1000).withColumn("v", F.col("id") * 2).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("id") > 500).select("v")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,500)]" in plan


def test_q5_all_dims_broadcast(spark):
    df = relational.q5_local_supplier_volume(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_withstructure_stays_single_project(parquet_person):
    out = reshape(parquet_person, "SELECT address.city FROM t withstructure")
    plan = _plan(out)
    assert "Exchange" not in plan
    assert plan.count("Project") == 1


def test_q6_predicates_reach_scan(spark):
    """Q6 is the pushdown showcase: every WHERE predicate must appear in
    PushedFilters, and the plan must be scan -> partial agg -> exchange
    -> final agg with no join."""
    df = relational.q6_revenue_forecast(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_discount" in pushed and "l_quantity" in pushed and "l_shipdate" in pushed
    assert "Join" not in plan


def test_q19_single_fact_scan_broadcast_dim(spark):
    """The OR'ed brand/size/qty windows must NOT become a union of three
    lineitem scans: one fact scan, part broadcast."""
    df = relational.q19_disjunctive_revenue(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q9_dims_broadcast(spark):
    df = relational.q9_nation_year_profit(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3


def test_q2_correlated_min_single_shuffle(spark):
    """The correlated-MIN rewrite must reuse the part-key partitioning:
    one exchange for the (part, supplier) aggregate, and the row_number
    window on part must not add a second shuffle of the aggregate."""
    df = relational.q2_min_cost_supplier(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "SortMergeJoin" not in plan  # dims all broadcast
    assert plan.count("lineitem.parquet") == 1


def test_q4_exists_is_semi_join(spark):
    df = relational.q4_priority_delivery(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "LeftSemi" in plan
    # orders quarter filter must reach the scan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "o_orderdate" in pushed


def test_q21_single_lineitem_scan_per_aggregate(spark):
    """The sole-latest-shipper self-join reads lineitem once for the
    per-(order,supplier) aggregate and derives everything else from it
    (exchange reuse), never re-scanning the fact table three times."""
    df = relational.q21_waiting_suppliers(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("lineitem.parquet") <= 2


def test_range_join_stays_equi(spark):
    """The bucketized interval join must plan as a hash/broadcast EQUI
    join — never BroadcastNestedLoopJoin (the non-equi fallback that
    dies at scale)."""
    df = relational.clicks_before_purchase(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan

"""Error-message parity tests for every guard (SURVEY.md §5.2 item 4):
prefixes match the reference's IllegalArgumentException strings."""

import pytest

from avro_sql_spark import AvroSqlError, parse, reshape


def test_non_select_rejected(simple_address):
    for q in ("DELETE FROM t", "INSERT INTO t VALUES (1)", "UPDATE t SET a=1", "DROP TABLE t"):
        with pytest.raises(AvroSqlError, match="Only `select` statements are allowed"):
            reshape(simple_address, q)


def test_invalid_query_prefix():
    for q in ("", "   ", None):
        with pytest.raises(AvroSqlError, match="Query is not valid"):
            parse(q)


def test_missing_field_message(person):
    with pytest.raises(AvroSqlError, match="Can't find field"):
        reshape(person, "SELECT bam")


def test_missing_nested_field_message(person):
    with pytest.raises(AvroSqlError, match="Can't find field"):
        reshape(person, "SELECT address.bam")


def test_flatten_array_message(pizza):
    with pytest.raises(AvroSqlError, match="Can't flatten from schema"):
        reshape(pizza, "SELECT ingredients")


def test_path_through_array_message(pizza):
    with pytest.raises(AvroSqlError, match="Can't select an element from an array"):
        reshape(pizza, "SELECT ingredients.name")  # flatten mode: arrays opaque


def test_nested_star_on_non_record(pizza):
    with pytest.raises(AvroSqlError, match="Only RECORD type is allowed"):
        reshape(pizza, "SELECT name.*")


def test_withstructure_missing_field(pizza):
    with pytest.raises(AvroSqlError, match="Schema doesn't contain it"):
        reshape(pizza, "SELECT bam FROM t withstructure")


def test_union_policy_message():
    from avro_sql_spark.sources.avro_schema import avro_to_spark_schema

    with pytest.raises(AvroSqlError, match="Unions has one specific type and null"):
        avro_to_spark_schema(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["int", "string", "null"]}]}
        )


def test_duplicate_selection_message(simple_address):
    with pytest.raises(AvroSqlError, match="more than once"):
        reshape(simple_address, "SELECT city, city")


def test_star_alias_rejected(simple_address):
    with pytest.raises(AvroSqlError, match="cannot be aliased"):
        reshape(simple_address, "SELECT * as everything")


# ---------------------------------------------------------------------------
# Guard-inventory golden-message audit (VERDICT r2 item 8): one
# parametrized sweep over EVERY reference IllegalArgumentException guard
# reachable from the planner surface, keyed by reference file:line, so
# error parity cannot rot silently as the surface grows. Triggers are
# (fixture-name, query-or-action); expectations are regex fragments of
# the reference's message (including its 'flattent' typo, kept for
# parity).
# ---------------------------------------------------------------------------

GUARD_INVENTORY = [
    # (ref_site, fixture, query, expected-message fragment)
    ("AvroSql.scala:59-60", "person", "", "Query is not valid"),
    ("AvroSql.scala:59-60 (dangling dot)", "person", "SELECT address.", "Query is not valid"),
    ("AvroSql.scala:62", "person", "DELETE FROM t", "Only `select` statements are allowed"),
    ("AvroSql.scala:62 (insert)", "person", "INSERT INTO t VALUES (1)", "Only `select` statements are allowed"),
    ("AvroSchemaSql.scala:62,181", "person", "SELECT bam", "Can't find field"),
    ("AvroSchemaSql.scala:62 (nested)", "person", "SELECT address.bam", "Can't find field"),
    ("AvroSchemaSql.scala:56,65", "person", "SELECT name.leaf", "Can't select field:"),
    ("AvroSchemaSql.scala:375", "pizza", "SELECT ingredients", "Can't flatten from schema"),
    ("AvroSchemaSql.scala:55 (array path)", "pizza", "SELECT ingredients.name", "Can't select an element from an array"),
    ("AvroSchemaSql.scala:193,201", "pizza", "SELECT name.*", "Only RECORD type is allowed"),
    ("AvroSchemaSql.scala:299,307", "pizza", "SELECT bam FROM t withstructure", "Schema doesn't contain it"),
    ("AvroSchemaSql.scala:149", "simple_address", "SELECT city, city", "more than once"),
    ("AvroSchemaSql.scala:149 (aliased dup)", "simple_address", "SELECT city as a, city", "more than once"),
    ("star alias (parser guard)", "simple_address", "SELECT * as everything", "cannot be aliased"),
]


@pytest.mark.parametrize(
    "ref_site,fixture,query,fragment",
    GUARD_INVENTORY,
    ids=[g[0] for g in GUARD_INVENTORY],
)
def test_guard_inventory(ref_site, fixture, query, fragment, request):
    df = request.getfixturevalue(fixture)
    with pytest.raises(AvroSqlError, match=fragment):
        reshape(df, query)


def test_guard_inventory_map_leaf(spark):
    """AvroSchemaSql.scala:55 — a path resolving INTO a map is rejected
    with the reference's Map message (flatten mode keeps maps opaque)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], ["a"]).select(
        F.create_map(F.lit("k"), F.lit("v")).alias("attrs")
    )
    with pytest.raises(AvroSqlError, match="since it resolved to a Map"):
        reshape(df, "SELECT attrs.k.x")


def test_guard_inventory_container(spark):
    """AvroSql.scala:106-131 + AvroSchemaSql.scala:113-114 — primitive
    container guards, including the reference's 'flattent' typo kept
    verbatim for parity."""
    from pyspark.sql import functions as F

    from avro_sql_spark import reshape_container

    prim = spark.createDataFrame([(1,)], ["value"])
    with pytest.raises(
        AvroSqlError, match="Can't select specific fields from primitive avro record"
    ):
        reshape_container(prim, "SELECT value")
    arr = prim.select(F.array(F.lit(1), F.lit(2)).alias("value"))
    with pytest.raises(AvroSqlError, match="Can't flattent schema type:ARRAY"):
        reshape_container(arr, "SELECT value")


def test_guard_inventory_union(spark):
    """AvroSchemaSql.scala:45 / AvroUnpacker.scala:94 — multi-type
    unions beyond [null, T] are rejected with the reference message."""
    from avro_sql_spark.sources.avro_schema import avro_to_spark_schema

    with pytest.raises(AvroSqlError, match="Unions has one specific type and null"):
        avro_to_spark_schema(
            {
                "type": "record",
                "name": "R",
                "fields": [{"name": "u", "type": ["int", "string", "null"]}],
            }
        )


def test_withstructure_requires_word_boundary(spark):
    """An identifier merely ENDING in 'withstructure' is a field
    selection, not structure mode (deliberate divergence from the
    reference's bare endsWith, documented in split_withstructure)."""
    from avro_sql_spark import reshape
    from avro_sql_spark.plans.fields import split_withstructure

    assert split_withstructure("SELECT awithstructure") == (
        "SELECT awithstructure",
        False,
    )
    assert split_withstructure("SELECT a withstructure") == ("SELECT a", True)
    assert split_withstructure("SELECT a WITHSTRUCTURE  ") == ("SELECT a", True)
    df = spark.createDataFrame([(1,)], ["awithstructure"])
    assert reshape(df, "SELECT awithstructure").columns == ["awithstructure"]

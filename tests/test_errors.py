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

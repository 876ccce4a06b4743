"""Ports of the reference's 22 flatten-mode golden cases
(AvroSqlTest.scala) — same queries, same fixtures (FIXTURES.md), asserting
output column order, values, and nullability."""

import pytest
from pyspark.sql.types import IntegerType, StructField, StructType

from avro_sql_spark import AvroSqlError, reshape, reshape_container, reshape_schema
from tests.conftest import PERSON_SCHEMA, names, row0


# --- F4 primitive containers (AvroSqlTest.scala:39-73) ---------------------

def _int_container(spark, nullable, value):
    schema = StructType([StructField("value", IntegerType(), nullable)])
    return spark.createDataFrame([(value,)], schema)


def test_int_container_identity(spark):
    df = _int_container(spark, False, 2000)
    assert row0(reshape_container(df, "SELECT *")) == (2000,)


def test_nullable_int_container_with_value(spark):
    df = _int_container(spark, True, 2000)
    assert row0(reshape_container(df, "SELECT *")) == (2000,)


def test_nullable_int_container_with_null(spark):
    df = _int_container(spark, True, None)
    assert row0(reshape_container(df, "SELECT *")) == (None,)


def test_select_field_from_primitive_raises(spark):
    df = _int_container(spark, False, 2000)
    with pytest.raises(AvroSqlError, match="primitive avro record"):
        reshape_container(df, "SELECT field1")


# --- Pizza flatten (AvroSqlTest.scala:75-130) -------------------------------

def test_pizza_project(pizza):
    out = reshape(pizza, "SELECT name,vegan, calories")
    assert names(out) == ["name", "vegan", "calories"]
    assert row0(out) == ("pepperoni", False, 98)


def test_pizza_rename(pizza):
    out = reshape(pizza, "SELECT name as fieldName,vegan as V, calories as C")
    assert names(out) == ["fieldName", "V", "C"]
    assert row0(out) == ("pepperoni", False, 98)


def test_pizza_reorder(pizza):
    out = reshape(pizza, "SELECT  calories as C,vegan as V,name as fieldName")
    assert names(out) == ["C", "V", "fieldName"]
    assert row0(out) == (98, False, "pepperoni")


def test_pizza_star_hits_array_raises(pizza):
    with pytest.raises(AvroSqlError, match="Can't flatten"):
        reshape(pizza, "SELECT *, name as fieldName")


# --- Person flatten (AvroSqlTest.scala:132-248) ------------------------------

def test_person_dup_names(person):
    out = reshape(person, "SELECT name, address.street.name")
    assert names(out) == ["name", "name_1"]
    assert row0(out) == ("Rick", "Rock St")


def test_person_nested_alias(person):
    out = reshape(person, "SELECT name, address.street.name as streetName")
    assert names(out) == ["name", "streetName"]
    assert row0(out) == ("Rick", "Rock St")


def test_person_nullable_propagation(person):
    out = reshape(
        person,
        "SELECT name, address.street.name as streetName, address.street2.name as streetName2",
    )
    assert names(out) == ["name", "streetName", "streetName2"]
    assert row0(out) == ("Rick", "Rock St", None)
    # selected through nullable street2 → output field nullable (O14)
    assert out.schema["streetName2"].nullable is True
    assert out.schema["streetName"].nullable is False


def test_person_nested_star(person):
    out = reshape(person, "SELECT name, address.street.*, address.street2.name as streetName2")
    assert names(out) == ["name", "name_1", "streetName2"]
    assert row0(out) == ("Rick", "Rock St", None)


def test_person_double_nested_star(person, person2):
    out = reshape(person, "SELECT name, address.street.*, address.street2.*")
    assert names(out) == ["name", "name_1", "name_2"]
    assert row0(out) == ("Rick", "Rock St", None)
    out2 = reshape(person2, "SELECT name, address.street.*, address.street2.*")
    assert row0(out2) == ("Rick", "Rock St", "412 East")


def test_person_mixed_order(person):
    out = reshape(person, "SELECT address.state, address.city,name, address.street.name")
    assert names(out) == ["state", "city", "name", "name_1"]
    assert row0(out) == ("CA", "MtV", "Rick", "Rock St")


def test_person_mixed_order_aliased(person):
    out = reshape(person, "SELECT address.state as S, address.city as C,name, address.street.name")
    assert names(out) == ["S", "C", "name", "name_1"]
    assert row0(out) == ("CA", "MtV", "Rick", "Rock St")


def test_person_missing_field_raises(person):
    with pytest.raises(AvroSqlError, match="Can't find field"):
        reshape(person, "SELECT address.bam, address.city,name, address.street.name")


# --- SimpleAddress flatten (AvroSqlTest.scala:251-305) -----------------------

def test_simple_identity(simple_address):
    out = reshape(simple_address, "SELECT * FROM simpleAddress")
    assert names(out) == ["street", "city", "state", "zip", "country"]
    assert row0(out) == ("Rock St", "MtV", "CA", "94041", "USA")


def test_simple_rename_mix(simple_address):
    out = reshape(
        simple_address, "SELECT street as S, city, state, zip as Z, country as C  FROM simpleAddress"
    )
    assert names(out) == ["S", "city", "state", "Z", "C"]
    assert row0(out) == ("Rock St", "MtV", "CA", "94041", "USA")


def test_simple_star_exclusion(simple_address):
    out = reshape(simple_address, "SELECT zip as Z, * FROM simpleAddress")
    assert names(out) == ["Z", "street", "city", "state", "country"]
    assert row0(out) == ("94041", "Rock St", "MtV", "CA", "USA")


def test_simple_star_exclusion_both_sides(simple_address):
    out = reshape(simple_address, "SELECT zip as Z, *, state as S FROM simpleAddress")
    assert names(out) == ["Z", "street", "city", "country", "S"]
    assert row0(out) == ("94041", "Rock St", "MtV", "USA", "CA")


# --- schema-only transform (O3) ----------------------------------------------

def test_reshape_schema_no_data(spark):
    out = reshape_schema(spark, PERSON_SCHEMA, "SELECT name, address.street.name as streetName")
    assert [f.name for f in out.fields] == ["name", "streetName"]


def test_duplicate_explicit_selection_raises(simple_address):
    with pytest.raises(AvroSqlError, match="more than once"):
        reshape(simple_address, "SELECT zip, zip")

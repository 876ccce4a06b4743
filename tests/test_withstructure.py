"""Ports of the reference's 21 withstructure golden cases
(AvroSqlWithRetainStructureTest.scala) — structure-retaining projection."""

import pytest
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

from avro_sql_spark import AvroSqlError, reshape, reshape_container
from tests.conftest import names, row0


def _int_container(spark, nullable, value):
    schema = StructType([StructField("value", IntegerType(), nullable)])
    return spark.createDataFrame([(value,)], schema)


# --- primitives behave identically in both modes (:36-70) -------------------

def test_int_container_identity_ws(spark):
    df = _int_container(spark, False, 2000)
    assert row0(reshape_container(df, "SELECT * FROM topic  withstructure")) == (2000,)


def test_nullable_int_with_value_ws(spark):
    df = _int_container(spark, True, 2000)
    assert row0(reshape_container(df, "SELECT * FROM topic withstructure")) == (2000,)


def test_nullable_int_with_null_ws(spark):
    df = _int_container(spark, True, None)
    assert row0(reshape_container(df, "SELECT * FROM topic  withstructure")) == (None,)


def test_select_field_from_primitive_raises_ws(spark):
    df = _int_container(spark, False, 2000)
    with pytest.raises(AvroSqlError, match="primitive avro record"):
        reshape_container(df, "SELECT field1 FROM topic  withstructure")


# --- Pizza withstructure (:72-290) -------------------------------------------

ING_PEP = ("pepperoni", 12.0, 4.4)
ING_ONI = ("onions", 1.0, 0.4)


def test_ws_identity(pizza):
    out = reshape(pizza, "SELECT *FROM topic withstructure")
    assert names(out) == ["name", "ingredients", "vegetarian", "vegan", "calories"]
    assert out.schema == pizza.schema


def test_ws_star_then_rename(pizza):
    out = reshape(pizza, "SELECT *, name as fieldName FROM topic withstructure")
    assert names(out) == ["ingredients", "vegetarian", "vegan", "calories", "fieldName"]
    r = row0(out)
    assert [tuple(e) for e in r[0]] == [ING_PEP, ING_ONI]
    assert r[1:] == (False, False, 98, "pepperoni")


def test_ws_star_then_rename_array(pizza):
    out = reshape(pizza, "SELECT *, ingredients as stuff FROM topic withstructure")
    assert names(out) == ["name", "vegetarian", "vegan", "calories", "stuff"]
    r = row0(out)
    assert r[:4] == ("pepperoni", False, False, 98)
    assert [tuple(e) for e in r[4]] == [ING_PEP, ING_ONI]


def test_ws_rename_then_star(pizza):
    out = reshape(pizza, "SELECT name as fieldName, * FROM topic withstructure")
    assert names(out) == ["fieldName", "ingredients", "vegetarian", "vegan", "calories"]
    r = row0(out)
    assert r[0] == "pepperoni"
    assert [tuple(e) for e in r[1]] == [ING_PEP, ING_ONI]
    assert r[2:] == (False, False, 98)


def test_ws_single_field(pizza):
    out = reshape(pizza, "SELECT vegan FROM topic withstructure")
    assert names(out) == ["vegan"]
    assert row0(out) == (False,)


def test_ws_single_field_alias(pizza):
    out = reshape(pizza, "SELECT vegan as veganA FROM topic withstructure")
    assert names(out) == ["veganA"]
    assert row0(out) == (False,)


def _ingredients(out):
    r = row0(out)
    assert len(r) == 1
    return [tuple(e) for e in r[0]]


def _elem_names(out):
    return [f.name for f in out.schema["ingredients"].dataType.elementType.fields]


def test_ws_array_single_subfield(pizza):
    out = reshape(pizza, "SELECT ingredients.name FROM topic withstructure")
    assert names(out) == ["ingredients"]
    assert _elem_names(out) == ["name"]
    assert _ingredients(out) == [("pepperoni",), ("onions",)]


def test_ws_array_two_subfields(pizza):
    out = reshape(pizza, "SELECT ingredients.name, ingredients.sugar FROM topic withstructure")
    assert _elem_names(out) == ["name", "sugar"]
    assert _ingredients(out) == [("pepperoni", 12.0), ("onions", 1.0)]


def test_ws_array_renamed_subfields(pizza):
    out = reshape(
        pizza,
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure",
    )
    assert _elem_names(out) == ["fieldName", "fieldSugar"]
    assert _ingredients(out) == [("pepperoni", 12.0), ("onions", 1.0)]


def test_ws_array_star_first(pizza):
    out = reshape(
        pizza,
        "SELECT ingredients.*,ingredients.name as fieldName, ingredients.sugar as fieldSugar "
        "FROM topic withstructure",
    )
    assert _elem_names(out) == ["fat", "fieldName", "fieldSugar"]
    assert _ingredients(out) == [(4.4, "pepperoni", 12.0), (0.4, "onions", 1.0)]


def test_ws_array_star_middle(pizza):
    out = reshape(
        pizza,
        "SELECT ingredients.name as fieldName,ingredients.*, ingredients.sugar as fieldSugar "
        "FROM topic withstructure",
    )
    assert _elem_names(out) == ["fieldName", "fat", "fieldSugar"]
    assert _ingredients(out) == [("pepperoni", 4.4, 12.0), ("onions", 0.4, 1.0)]


def test_ws_array_star_last(pizza):
    out = reshape(
        pizza,
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar, ingredients.* "
        "FROM topic withstructure",
    )
    assert _elem_names(out) == ["fieldName", "fieldSugar", "fat"]
    assert _ingredients(out) == [("pepperoni", 12.0, 4.4), ("onions", 1.0, 0.4)]


def test_ws_mixed_levels(pizza):
    out = reshape(
        pizza,
        "SELECT name, ingredients.name as fieldName, ingredients.sugar as fieldSugar, "
        "ingredients.* FROM topic withstructure",
    )
    assert names(out) == ["name", "ingredients"]
    r = row0(out)
    assert r[0] == "pepperoni"
    assert [tuple(e) for e in r[1]] == [("pepperoni", 12.0, 4.4), ("onions", 1.0, 0.4)]


def test_ws_mixed_levels_trailing_scalar(pizza):
    out = reshape(
        pizza,
        "SELECT name, ingredients.name as fieldName, ingredients.sugar as fieldSugar, "
        "ingredients.*, calories as cals FROM topic withstructure",
    )
    assert names(out) == ["name", "ingredients", "cals"]
    r = row0(out)
    assert (r[0], r[2]) == ("pepperoni", 98)
    assert [tuple(e) for e in r[1]] == [("pepperoni", 12.0, 4.4), ("onions", 1.0, 0.4)]


def test_ws_mixed_levels_interleaved(pizza):
    out = reshape(
        pizza,
        "SELECT name, ingredients.name as fieldName, calories as cals, "
        "ingredients.sugar as fieldSugar, ingredients.* FROM topic withstructure",
    )
    # query order of first mention: name, ingredients, cals
    assert names(out) == ["name", "ingredients", "cals"]
    r = row0(out)
    assert (r[0], r[2]) == ("pepperoni", 98)
    assert [tuple(e) for e in r[1]] == [("pepperoni", 12.0, 4.4), ("onions", 1.0, 0.4)]


# --- null propagation through nested reshape ---------------------------------

def test_ws_null_struct_stays_null(person):
    out = reshape(person, "SELECT address.street2.name FROM topic withstructure")
    assert names(out) == ["address"]
    r = row0(out)
    assert r[0] is not None  # address itself non-null
    assert r[0]["street2"] is None  # null struct propagates, not struct(null)

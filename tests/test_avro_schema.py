"""Avro schema sidecar tests: metadata round-trip (O16), logical types
(O17), union policy (O13)."""

import json

import pytest
from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructType,
    TimestampType,
)

from avro_sql_spark import AvroSqlError
from avro_sql_spark.sources.avro_schema import (
    avro_to_spark_schema,
    avro_to_spark_type,
    spark_to_avro_schema,
)

PIZZA_AVRO = {
    "type": "record",
    "name": "Pizza",
    "namespace": "com.landoop.sql.avro",
    "fields": [
        {"name": "name", "type": "string"},
        {
            "name": "ingredients",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "Ingredient",
                    "fields": [
                        {"name": "name", "type": "string"},
                        {"name": "sugar", "type": "double"},
                        {"name": "fat", "type": "double"},
                    ],
                },
            },
        },
        {"name": "vegetarian", "type": "boolean"},
        {"name": "vegan", "type": "boolean"},
        {"name": "calories", "type": "int"},
    ],
}


def test_pizza_schema_conversion():
    st = avro_to_spark_schema(PIZZA_AVRO)
    assert st.fieldNames() == ["name", "ingredients", "vegetarian", "vegan", "calories"]
    assert st["ingredients"].dataType.elementType.fieldNames() == ["name", "sugar", "fat"]
    assert not st["name"].nullable


def test_nullable_union():
    st = avro_to_spark_schema(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "a", "type": ["null", "string"]},
                {"name": "b", "type": ["int", "null"]},
            ],
        }
    )
    assert st["a"].nullable and st["a"].dataType == StringType()
    assert st["b"].nullable and st["b"].dataType == IntegerType()


def test_multi_branch_union_rejected():
    with pytest.raises(AvroSqlError, match="Unions has one specific type and null"):
        avro_to_spark_schema(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["int", "string"]}]}
        )


def test_logical_types():
    dt, _, _ = avro_to_spark_type({"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2})
    assert dt == DecimalType(10, 2)
    dt, _, _ = avro_to_spark_type({"type": "int", "logicalType": "date"})
    assert dt == DateType()
    dt, _, _ = avro_to_spark_type({"type": "long", "logicalType": "timestamp-millis"})
    assert dt == TimestampType()
    dt, _, _ = avro_to_spark_type({"type": "string", "logicalType": "uuid"})
    assert dt == StringType()


def test_metadata_round_trip():
    avro = {
        "type": "record",
        "name": "Doc",
        "namespace": "com.example",
        "doc": "a documented record",
        "fields": [
            {"name": "id", "type": "long", "doc": "primary key"},
            {"name": "tag", "type": ["null", "string"], "default": None},
        ],
    }
    st = avro_to_spark_schema(avro)
    assert st["id"].metadata["avro.doc"] == "primary key"
    # rebuild: namespace/doc must survive via explicit root args +
    # field-level metadata
    out = spark_to_avro_schema(st, name="Doc", namespace="com.example", doc="a documented record")
    assert out["namespace"] == "com.example"
    assert out["doc"] == "a documented record"
    assert out["fields"][0]["doc"] == "primary key"
    assert out["fields"][1]["type"] == ["null", "string"]
    assert out["fields"][1]["default"] is None
    # and it parses as JSON cleanly
    json.dumps(out)


def test_enum_and_fixed_round_trip():
    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {
                "name": "color",
                "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN"]},
            },
            {"name": "hash", "type": {"type": "fixed", "name": "MD5", "size": 16}},
        ],
    }
    st = avro_to_spark_schema(avro)
    assert st["color"].dataType == StringType()
    assert st["color"].metadata["avro.symbols"] == ["RED", "GREEN"]
    out = spark_to_avro_schema(st, name="R")
    assert out["fields"][0]["type"]["symbols"] == ["RED", "GREEN"]
    assert out["fields"][1]["type"]["size"] == 16


def test_custom_props_preserved():
    avro = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": {"type": "string", "myProp": "myValue"}}],
    }
    st = avro_to_spark_schema(avro)
    assert st["x"].metadata["avro.prop.myProp"] == "myValue"
    out = spark_to_avro_schema(st, name="R")
    assert out["fields"][0]["type"]["myProp"] == "myValue"


def test_enum_inside_array_round_trips():
    """Element-level named-type metadata must survive the container:
    enum symbols inside an array round-trip to the rebuilt schema."""
    from avro_sql_spark.sources.avro_schema import (
        avro_to_spark_schema,
        avro_to_spark_type,
        spark_to_avro_type,
    )

    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {
                "name": "colors",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "enum",
                        "name": "Color",
                        "symbols": ["RED", "GREEN"],
                    },
                },
            }
        ],
    }
    schema = avro_to_spark_schema(avro)
    f = schema.fields[0]
    out = spark_to_avro_type(f.dataType, f.nullable, dict(f.metadata), f.name)
    assert out["items"]["type"] == "enum"
    assert out["items"]["name"] == "Color"
    assert out["items"]["symbols"] == ["RED", "GREEN"]


def test_nonnull_default_flips_union_order():
    """Avro requires a union default to match the FIRST branch: a field
    with a non-null default must rebuild as [T, null], and a nullable
    field without a default must NOT gain an injected one."""
    from avro_sql_spark.sources.avro_schema import (
        avro_to_spark_schema,
        spark_to_avro_schema,
    )

    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "x", "type": ["int", "null"], "default": 5},
            {"name": "y", "type": ["null", "string"]},
        ],
    }
    rebuilt = spark_to_avro_schema(avro_to_spark_schema(avro), name="R")
    fx = next(f for f in rebuilt["fields"] if f["name"] == "x")
    fy = next(f for f in rebuilt["fields"] if f["name"] == "y")
    assert fx["type"][0] != "null" and fx["default"] == 5
    assert "default" not in fy and fy["type"][0] == "null"


def test_time_logical_types_reemitted():
    from avro_sql_spark.sources.avro_schema import (
        avro_to_spark_schema,
        spark_to_avro_schema,
    )

    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "tm", "type": {"type": "int", "logicalType": "time-millis"}},
            {"name": "tu", "type": {"type": "long", "logicalType": "time-micros"}},
        ],
    }
    rebuilt = spark_to_avro_schema(avro_to_spark_schema(avro), name="R")
    types = {f["name"]: f["type"] for f in rebuilt["fields"]}
    assert types["tm"] == {"type": "int", "logicalType": "time-millis"}
    assert types["tu"] == {"type": "long", "logicalType": "time-micros"}


def test_dict_wrapped_type_and_props_merge():
    """A dict-wrapped type object (legal Avro) must not crash on the
    primitive-lookup, and the wrapper's custom props must survive."""
    from avro_sql_spark.sources.avro_schema import avro_to_spark_type
    from pyspark.sql.types import StringType

    dtype, nullable, meta = avro_to_spark_type(
        {"type": {"type": "string"}, "myProp": "v"}
    )
    assert dtype == StringType()
    assert meta.get("avro.prop.myProp") == "v"

"""Compat-layer tests: the reference's record.sql() calling convention
over Avro-JSON dicts, parse/plan once."""

from avro_sql_spark.compat import AvroSqlProcessor
from tests.test_avro_schema import PIZZA_AVRO

PIZZA_REC = {
    "name": "pepperoni",
    "ingredients": [
        {"name": "pepperoni", "sugar": 12.0, "fat": 4.4},
        {"name": "onions", "sugar": 1.0, "fat": 0.4},
    ],
    "vegetarian": False,
    "vegan": False,
    "calories": 98,
}


def test_flatten_record(spark):
    p = AvroSqlProcessor(spark, PIZZA_AVRO, "SELECT name, calories as cals")
    out = p.apply([PIZZA_REC])
    assert out == [{"name": "pepperoni", "cals": 98}]


def test_withstructure_record(spark):
    p = AvroSqlProcessor(
        spark,
        PIZZA_AVRO,
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure",
    )
    out = p.apply([PIZZA_REC])
    assert out == [
        {
            "ingredients": [
                {"fieldName": "pepperoni", "fieldSugar": 12.0},
                {"fieldName": "onions", "fieldSugar": 1.0},
            ]
        }
    ]


def test_null_record_passthrough(spark):
    p = AvroSqlProcessor(spark, PIZZA_AVRO, "SELECT name")
    assert p.apply([None, PIZZA_REC, None]) == [None, {"name": "pepperoni"}, None]


def test_out_avro_schema_carries_identity(spark):
    p = AvroSqlProcessor(spark, PIZZA_AVRO, "SELECT name, calories")
    out = p.out_avro_schema()
    assert out["name"] == "Pizza"
    assert out["namespace"] == "com.landoop.sql.avro"
    assert [f["name"] for f in out["fields"]] == ["name", "calories"]


def test_plan_reuse_many_batches(spark):
    p = AvroSqlProcessor(spark, PIZZA_AVRO, "SELECT calories as C")
    for batch in ([PIZZA_REC] * 3, [PIZZA_REC]):
        assert p.apply(batch) == [{"C": 98}] * len(batch)

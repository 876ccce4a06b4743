"""Deep/exotic nesting edge cases for the withstructure compiler:
array-of-array, struct-in-array-in-struct, 4-level paths, empty frames."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from avro_sql_spark import reshape
from tests.conftest import row0


def _s(fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


@pytest.fixture(scope="module")
def deep(spark):
    leaf = _s([("x", IntegerType(), False), ("y", IntegerType(), False)])
    mid = _s([("leafs", ArrayType(leaf, False), False), ("tag", StringType(), False)])
    top = _s([("name", StringType(), False), ("mids", ArrayType(mid, False), False)])
    rows = [
        (
            "r1",
            [
                ([(1, 10), (2, 20)], "a"),
                ([(3, 30)], "b"),
            ],
        )
    ]
    return spark.createDataFrame(rows, top)


def test_array_within_array_projection(deep):
    out = reshape(deep, "SELECT name, mids.leafs.x FROM t withstructure")
    r = row0(out)
    assert r[0] == "r1"
    mids = [[tuple(leaf) for leaf in m["leafs"]] for m in r[1]]
    assert mids == [[(1,), (2,)], [(3,)]]
    mid_type = out.schema["mids"].dataType.elementType
    assert [f.name for f in mid_type.fields] == ["leafs"]
    assert [f.name for f in mid_type["leafs"].dataType.elementType.fields] == ["x"]


def test_mixed_level_in_nested_arrays(deep):
    out = reshape(deep, "SELECT mids.tag, mids.leafs.y as why FROM t withstructure")
    r = row0(out)
    mids = [(m["tag"], [tuple(l) for l in m["leafs"]]) for m in r[0]]
    assert mids == [("a", [(10,), (20,)]), ("b", [(30,)])]


def test_four_level_flatten(spark):
    l4 = _s([("v", IntegerType(), False)])
    l3 = _s([("d", l4, False)])
    l2 = _s([("c", l3, True)])
    l1 = _s([("b", l2, False)])
    df = spark.createDataFrame([(((((7,),),),),)], _s([("a", l1, False)]))
    out = reshape(df, "SELECT a.b.c.d.v as deep_v")
    assert row0(out) == (7,)
    assert out.schema["deep_v"].nullable  # c is nullable on the path


def test_empty_frame_reshape(spark):
    from tests.conftest import PERSON_SCHEMA

    df = spark.createDataFrame([], PERSON_SCHEMA)
    out = reshape(df, "SELECT name, address.street.name as sn")
    assert out.count() == 0
    assert out.columns == ["name", "sn"]
    out_ws = reshape(df, "SELECT address.city FROM t withstructure")
    assert out_ws.count() == 0


def test_backquoted_identifiers(spark):
    df = spark.createDataFrame([(1, 2)], "`select` INT, `from` INT")
    out = reshape(df, "SELECT `select` as s, `from` as f")
    assert row0(out) == (1, 2)


def test_array_of_array_passthrough(spark):
    schema = _s([("aa", ArrayType(ArrayType(IntegerType(), False), False), False)])
    df = spark.createDataFrame([([[1, 2], [3]],)], schema)
    out = reshape(df, "SELECT aa FROM t withstructure")
    assert row0(out) == ([[1, 2], [3]],)

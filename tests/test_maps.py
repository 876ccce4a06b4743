"""Map projection tests (O12) — the reference implements map key
selection/rename and value projection (AvroSql.scala:246-278) but never
tests it; FIXTURES.md suggests this fixture shape."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from avro_sql_spark import reshape
from tests.conftest import row0


@pytest.fixture(scope="module")
def mapped(spark):
    schema = StructType(
        [
            StructField("name", StringType(), False),
            StructField(
                "attrs",
                MapType(
                    StringType(),
                    StructType([StructField("v", DoubleType(), False), StructField("w", DoubleType(), False)]),
                    False,
                ),
                False,
            ),
        ]
    )
    rows = [("thing", {"a": (1.0, 10.0), "b": (2.0, 20.0), "c": (3.0, 30.0)})]
    return spark.createDataFrame(rows, schema)


def test_map_key_selection(mapped):
    out = reshape(mapped, "SELECT name, attrs.a, attrs.c FROM t withstructure")
    r = row0(out)
    assert set(r[1].keys()) == {"a", "c"}


def test_map_key_rename(mapped):
    out = reshape(mapped, "SELECT attrs.a as alpha, attrs.b as beta FROM t withstructure")
    r = row0(out)
    assert set(r[0].keys()) == {"alpha", "beta"}
    assert tuple(r[0]["alpha"]) == (1.0, 10.0)


def test_map_absent_key_skipped(mapped):
    out = reshape(mapped, "SELECT attrs.a, attrs.zzz FROM t withstructure")
    r = row0(out)
    assert set(r[0].keys()) == {"a"}  # absent key silently skipped


def test_map_passthrough(mapped):
    out = reshape(mapped, "SELECT name, attrs FROM t withstructure")
    r = row0(out)
    assert set(r[1].keys()) == {"a", "b", "c"}


def test_map_value_projection(mapped):
    # deeper path: attrs.a.v keeps key 'a' and projects v inside its
    # value (first segment after a map is a KEY, AvroSql.scala:253-268)
    out = reshape(mapped, "SELECT attrs.a.v FROM t withstructure")
    r = row0(out)
    assert set(r[0].keys()) == {"a"}
    assert tuple(r[0]["a"]) == (1.0,)
    vtype = out.schema["attrs"].dataType.valueType
    assert [f.name for f in vtype.fields] == ["v"]


def test_map_flatten_guard(mapped):
    from avro_sql_spark import AvroSqlError

    with pytest.raises(AvroSqlError, match="Can't flatten"):
        reshape(mapped, "SELECT attrs")  # map leaf in flatten mode

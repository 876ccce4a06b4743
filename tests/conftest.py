import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from avro_sql_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("avro-sql-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


def _struct(fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# F1 — Pizza (record containing array-of-records), FIXTURES.md
INGREDIENT = _struct(
    [("name", StringType(), False), ("sugar", DoubleType(), False), ("fat", DoubleType(), False)]
)
PIZZA_SCHEMA = _struct(
    [
        ("name", StringType(), False),
        ("ingredients", ArrayType(INGREDIENT, False), False),
        ("vegetarian", BooleanType(), False),
        ("vegan", BooleanType(), False),
        ("calories", IntegerType(), False),
    ]
)
PIZZA_ROW = ("pepperoni", [("pepperoni", 12.0, 4.4), ("onions", 1.0, 0.4)], False, False, 98)

# F2 — Person (3-level nesting + nullable struct)
STREET = _struct([("name", StringType(), False)])
ADDRESS = _struct(
    [
        ("street", STREET, False),
        ("street2", STREET, True),
        ("city", StringType(), False),
        ("state", StringType(), False),
        ("zip", StringType(), False),
        ("country", StringType(), False),
    ]
)
PERSON_SCHEMA = _struct([("name", StringType(), False), ("address", ADDRESS, False)])
PERSON_ROW = ("Rick", (("Rock St",), None, "MtV", "CA", "94041", "USA"))
PERSON_ROW2 = ("Rick", (("Rock St",), ("412 East",), "MtV", "CA", "94041", "USA"))

# F3 — SimpleAddress (flat record)
SIMPLE_ADDRESS_SCHEMA = _struct(
    [(n, StringType(), False) for n in ("street", "city", "state", "zip", "country")]
)
SIMPLE_ADDRESS_ROW = ("Rock St", "MtV", "CA", "94041", "USA")


@pytest.fixture(scope="session")
def pizza(spark):
    return spark.createDataFrame([PIZZA_ROW], PIZZA_SCHEMA)


@pytest.fixture(scope="session")
def person(spark):
    return spark.createDataFrame([PERSON_ROW], PERSON_SCHEMA)


@pytest.fixture(scope="session")
def person2(spark):
    return spark.createDataFrame([PERSON_ROW2], PERSON_SCHEMA)


@pytest.fixture(scope="session")
def simple_address(spark):
    return spark.createDataFrame([SIMPLE_ADDRESS_ROW], SIMPLE_ADDRESS_SCHEMA)


def names(df):
    return df.columns


def row0(df):
    rows = df.collect()
    assert len(rows) == 1
    return tuple(rows[0])

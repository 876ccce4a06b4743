"""Public reshape API — the Spark-native equivalent of the reference's
``record.sql("SELECT ...")`` extension method (AvroSql.scala:43-65).

The unit of data is a DataFrame instead of a single Avro record: the
query is parsed and planned ONCE, compiled to Catalyst ``Column``
expressions, and applied with a single ``df.select`` — batch or
streaming (the projection is stateless, so the same plan works unchanged
under Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .errors import AvroSqlError
from .plans.fields import Field, parse
from .plans.flatten import plan_flatten
from .plans.structure import plan_withstructure


def reshape(df: DataFrame, query: str) -> DataFrame:
    """Apply a reshape-dialect query (``SELECT`` projection list, optional
    trailing ``withstructure``) to ``df``. Entry point 1 of the reference
    (AvroSql.scala:44-65)."""
    fields, withstructure = parse(query)
    return reshape_fields(df, fields, flatten=not withstructure)


def reshape_fields(df: DataFrame, fields: list[Field], flatten: bool = True) -> DataFrame:
    """Pre-parsed entry point (reference entry point 3,
    AvroSql.scala:86-103): the host caches the projection list and
    dispatches many frames through one parse."""
    plan = plan_flatten(df.schema, fields) if flatten else plan_withstructure(df.schema, fields)
    return df if plan is None else df.select(*plan)


def reshape_container(df: DataFrame, query: str) -> DataFrame:
    """Primitive-container mode (reference ``NonRecordContainer``,
    AvroSql.scala:70,108-111): a single-column DataFrame carrying a bare
    value. Only ``SELECT *`` is legal; selecting fields from a primitive
    raises, as does flattening an array/map root
    (AvroSchemaSql.scala:113-114, AvroSql.scala:106-131)."""
    fields, withstructure = parse(query)
    if len(df.columns) != 1:
        raise AvroSqlError("Container mode requires a single-column DataFrame")
    if len(fields) == 1 and fields[0].is_star and not fields[0].has_parents:
        return df
    dtype = df.schema.fields[0].dataType
    if isinstance(dtype, StructType):
        raise AvroSqlError("Can't select multiple fields from a value container")
    if not withstructure and dtype.typeName() in ("array", "map"):
        raise AvroSqlError(f"Can't flattent schema type:{dtype.typeName().upper()}")
    raise AvroSqlError(
        f"Can't select specific fields from primitive avro record:{dtype.simpleString()}"
    )


def reshape_schema(spark: SparkSession, schema: StructType, query: str) -> StructType:
    """Schema-only transform (reference O3, ``Schema.copy``,
    AvroSchemaSql.scala:77-85): derive the output schema without any
    data — this is the planner applied to an empty frame."""
    return reshape(spark.createDataFrame([], schema), query).schema

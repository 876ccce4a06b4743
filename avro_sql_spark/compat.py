"""Host-embedding compat layer: the reference's calling convention
(``record.sql("SELECT ...")`` on one Avro record at a time,
AvroSql.scala:43-65) adapted to batches.

A reference user migrating a Kafka Connect SMT or similar host calls
:class:`AvroSqlProcessor` once per query; it parses and plans ONCE
against the Avro schema (the reference re-derives per record) and then
reshapes arbitrarily many record batches. Records are plain dicts
(Avro JSON-encoding shaped); the output schema is available as both a
Spark StructType and an Avro JSON schema via the sidecar.
"""

from __future__ import annotations

import json
from typing import Any, Sequence

from pyspark.sql import SparkSession

from .plans.fields import parse
from .reshape import reshape_fields
from .sources.avro_schema import avro_to_spark_schema, spark_to_avro_schema


class AvroSqlProcessor:
    """Parse/plan once, reshape many — entry point 3 of the reference
    (AvroSql.scala:86-103) with the schema work also hoisted out of the
    per-record path."""

    def __init__(self, spark: SparkSession, avro_schema: str | dict, query: str):
        self.spark = spark
        self.avro_schema = (
            json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
        )
        self.in_schema = avro_to_spark_schema(self.avro_schema)
        self.fields, ws = parse(query)
        self.flatten = not ws
        # derive the output schema with no data (reference O3)
        empty = spark.createDataFrame([], self.in_schema)
        self.out_schema = reshape_fields(empty, self.fields, flatten=self.flatten).schema

    def out_avro_schema(self) -> dict:
        """Avro JSON schema of the output, carrying the input's
        name/namespace (reference O16)."""
        return spark_to_avro_schema(
            self.out_schema,
            name=self.avro_schema.get("name", "topLevelRecord"),
            namespace=self.avro_schema.get("namespace"),
            doc=self.avro_schema.get("doc"),
        )

    def apply(self, records: Sequence[dict]) -> list[dict]:
        """Reshape a batch of records (null in → null out, as
        AvroSql.scala:68)."""
        live = [r for r in records if r is not None]
        if not live:
            return [None] * len(records)
        df = self.spark.createDataFrame([_to_row(r, self.in_schema) for r in live], self.in_schema)
        out = reshape_fields(df, self.fields, flatten=self.flatten)
        reshaped = iter([row.asDict(recursive=True) for row in out.collect()])
        return [None if r is None else next(reshaped) for r in records]


def _convert(v: Any, dtype) -> Any:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if v is None:
        return None
    if isinstance(dtype, StructType):
        return _to_row(v, dtype)
    if isinstance(dtype, ArrayType):
        return [_convert(e, dtype.elementType) for e in v]
    if isinstance(dtype, MapType):
        return {k: _convert(val, dtype.valueType) for k, val in v.items()}
    return v


def _to_row(record: dict, schema) -> tuple:
    """dict → positional tuple matching the struct order (recursive)."""
    return tuple(_convert(record.get(f.name), f.dataType) for f in schema.fields)

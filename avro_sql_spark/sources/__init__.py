from .io import read_table, write_table
from .avro_schema import spark_to_avro_schema, avro_to_spark_schema

__all__ = ["read_table", "write_table", "spark_to_avro_schema", "avro_to_spark_schema"]

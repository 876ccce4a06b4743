"""avro_sql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lensesio/avro-sql, rebuilt Spark-first.

Core surface:
 - :func:`reshape` / :func:`reshape_fields` / :func:`reshape_schema` —
   the reference's nested-projection dialect (flatten + withstructure)
   compiled to Catalyst expressions
 - :mod:`avro_sql_spark.operators` — relational queries, dedup,
   similarity search, text analysis, multimodal plumbing
 - :mod:`avro_sql_spark.sources` — batch/stream readers and writers
"""

from .compat import AvroSqlProcessor
from .errors import AvroSqlError
from .plans.fields import Field, SqlContext, parse
from .reshape import reshape, reshape_container, reshape_fields, reshape_schema
from .session import get_spark, load_tables

__version__ = "0.1.0"

__all__ = [
    "AvroSqlError",
    "Field",
    "SqlContext",
    "parse",
    "reshape",
    "reshape_container",
    "reshape_fields",
    "reshape_schema",
    "get_spark",
    "load_tables",
]

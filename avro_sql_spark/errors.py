"""Error types mirroring the reference's IllegalArgumentException usage.

The reference (lensesio/avro-sql) raises ``IllegalArgumentException`` for
every user error (AvroSql.scala:59-63, AvroSchemaSql.scala:113-114,372-379).
We keep one exception type with message prefixes matching the reference
strings so error-parity tests can assert on them.
"""


class AvroSqlError(ValueError):
    """User error in the reshape dialect (parse, plan, or validation)."""

"""Postgres DDL generation from Spark schemas.

The reference declares ``db/init/01_ddl.sql`` (README.md:186-191) but the
file is absent from its repo; this closes that declared surface: generate
the DWH CREATE TABLE statements from the engine's own gold DataFrames, so
the DDL can never drift from the schema Spark actually writes over JDBC
(io/sinks.py::write_jdbc with ``truncate=true`` keeps this DDL intact on
reload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark -> Postgres type mapping (mirrors Spark's JDBC PostgresDialect so
# hand-applied DDL matches what df.write.jdbc would create).
_PG_TYPES: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.ByteType, "SMALLINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "REAL"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.StringType, "TEXT"),
    (T.BinaryType, "BYTEA"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
]


def pg_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return pg_type(dt.elementType) + "[]"
    for spark_t, pg in _PG_TYPES:
        if isinstance(dt, spark_t):
            return pg
    raise ValueError(f"no Postgres mapping for Spark type {dt.simpleString()}")


def postgres_ddl(
    df: DataFrame,
    table: str,
    primary_key: list[str] | None = None,
    if_not_exists: bool = True,
) -> str:
    """CREATE TABLE statement matching ``df``'s schema (nullability kept)."""
    lines = []
    for f in df.schema.fields:
        null = "" if f.nullable else " NOT NULL"
        lines.append(f"    {f.name} {pg_type(f.dataType)}{null}")
    if primary_key:
        lines.append(f"    PRIMARY KEY ({', '.join(primary_key)})")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    body = ",\n".join(lines)
    return f"CREATE TABLE {ine}{table} (\n{body}\n);"


def star_schema_ddl(gold: dict[str, DataFrame], keys: dict[str, list[str]] | None = None) -> str:
    """The full ``01_ddl.sql`` body for a dict of gold tables."""
    keys = keys or {}
    return "\n\n".join(
        postgres_ddl(df, name, keys.get(name)) for name, df in gold.items()
    )

"""Idempotent catalog bootstrap (SURVEY.md §2.1 `ddl_bootstrap`).

The reference bootstraps Postgres with bash+psql `CREATE ... IF NOT
EXISTS` (EUREKATables.sh:17-60). The engine's catalog equivalent
registers the canonical tables in the Spark catalog from the schema
registry — one source of truth (schemas.py), no DDL strings drifting
from the code (the reference's airwise_datav1 has no DDL at all,
AIRWISEv1.py:232-235).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import (
    AIRWISE_DATA_SCHEMA,
    AIRWISE_DATAV1_SCHEMA,
    BATTERY_DATA_SCHEMA,
    NODE_DIM_SCHEMA,
)

CANONICAL_TABLES: dict[str, T.StructType] = {
    "airwise_data": AIRWISE_DATA_SCHEMA,
    "airwise_datav1": AIRWISE_DATAV1_SCHEMA,
    "battery_data": BATTERY_DATA_SCHEMA,
    "node_dim": NODE_DIM_SCHEMA,
}


def _ddl_columns(schema: T.StructType) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def ddl_bootstrap(
    spark: SparkSession,
    database: str = "eureka",
    location: str | None = None,
) -> list[str]:
    """Create the database and canonical tables if missing; returns DDL run.

    Idempotent like EUREKATables.sh:17-41 (`IF NOT EXISTS` everywhere).
    ``location`` roots the tables as external parquet (the engine-native
    layout); without it they are managed tables in the session catalog.
    """
    executed: list[str] = []
    stmt = f"CREATE DATABASE IF NOT EXISTS {database}"
    spark.sql(stmt)
    executed.append(stmt)
    for name, schema in CANONICAL_TABLES.items():
        stmt = (
            f"CREATE TABLE IF NOT EXISTS {database}.{name} ({_ddl_columns(schema)}) "
            "USING parquet"
        )
        if location:
            stmt += f" LOCATION '{location}/{name}'"
        spark.sql(stmt)
        executed.append(stmt)
    return executed


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key (SURVEY §4 'bucketing for co-located joins').

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT any Exchange: the bucket layout IS the shuffle, paid once at
    write time and amortized over every subsequent join/aggregation on
    that key — at 100 TB this converts the recurring fact-fact shuffle
    into a one-time layout decision. Verified shuffle-free in
    tests/test_plans.py::test_bucketed_join_has_no_exchange.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)

"""Testdata table loaders (TESTDATA.md).

One place that knows the parquet layout, so every query builder takes
``(spark, sf_dir)`` and calls ``load(spark, sf_dir, name)``. Plain
``spark.read.parquet`` — Catalyst handles column pruning and filter
pushdown from the lazy plan; nothing to hand-tune here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Session-scoped DataFrame reuse: the testdata parquet is immutable, so
# handing every builder the SAME DataFrame object per (session, sf_dir,
# table) lets Spark reuse the resolved relation and its file index
# instead of re-listing + re-inferring schema on every query — a fixed
# per-query driver cost that dominates sub-second benchmarks. (Lazy
# plans only: nothing is cached/persisted executor-side.)
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    _LOAD_CACHE[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Some testdata generations write ts as TIMESTAMP(NANOS), which
        # Spark's parquet reader rejects. Read nanos as LongType (set
        # the legacy conf here so ANY caller's session works, not just
        # ours) and convert to micros (floor — same truncation DuckDB
        # applies on read).
        from pyspark.sql.types import LongType

        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked down; fall through and hope it's preset
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(spark.read.parquet(table_path(sf_dir, name)))


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP_LTZ, wall-clock
    interpreted as UTC (epoch-preserving, independent of the caller
    session's timezone — unlike a plain ``cast("timestamp")``).

    Testdata parquet generations vary in whether timestamps carry
    isAdjustedToUTC; Spark 4 infers NTZ for the naive variant, which
    breaks epoch arithmetic (``cast(ts as long)`` is illegal on NTZ)
    and tz conversions downstream. DuckDB reads both variants as naive
    wall clocks, so pinning NTZ -> UTC keeps oracle value parity.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.to_utc_timestamp(F.col(c), "UTC"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TESTDATA_TABLES}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a small input is spread across the cluster before a
    CPU-heavy narrow stage (shingle hashing, all-pairs joins, sketches).

    A table that arrives as one small file is one scan partition, so
    every downstream narrow transform runs single-threaded no matter how
    many cores exist. Repartition ONLY when below the session's default
    parallelism: at 100 TB inputs already carry thousands of splits and
    this is a no-op (no shuffle); locally it turns a 1-task pipeline
    into a full-width one for the cost of shuffling a few MB.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

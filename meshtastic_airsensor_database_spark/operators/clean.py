"""Batch ETL operators — cleandata.py parity (SURVEY.md §2.2, §2.6-2.8, §3.2).

The reference's ``cleandata.py`` pipeline (argv CSVs -> concat ->
to_datetime(utc, coerce) -> dropna -> tz_convert(Pacific) -> sort ->
project 7 cols -> round(3) -> strftime -> to_csv) re-expressed as ONE
lazy DataFrame chain. Catalyst collapses the projections, pushes the
null-drop toward the scan, and prunes unread CSV columns — the
eager-pandas inefficiencies (SURVEY §4.1) disappear structurally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import round_cols, timestamp_parse_coerce, utc_to_pacific
from ..schemas import PURPLEAIR_CLEAN_COLUMNS

ROUND_COLS = ["pm1_0_atm", "pm2_5_atm", "pm10_0_atm", "pressure"]  # cleandata.py:44-46


def multi_file_union(spark: SparkSession, paths: list[str], **csv_opts) -> DataFrame:
    """Concat N same-schema CSVs (cleandata.py:11-19 ``pd.concat``).

    Spark's multi-path reader IS the union — one scan node, no
    driver-side loop, indexes never existed to discard.
    """
    return spark.read.csv(paths, header=True, **csv_opts)


def align_to_schema(df: DataFrame, target, strict: bool = False) -> DataFrame:
    """Project ``df`` onto ``target`` (a StructType): missing columns
    become typed nulls, present columns are cast to the target type,
    extra columns are dropped (or rejected with ``strict=True``).

    The schema-drift guard for long-lived tables: at 100 TB a fact
    table accumulates files written by many pipeline versions, and
    every consumer needs ONE declared schema rather than whatever the
    newest writer emitted. Pure projection — no shuffle, pushed-down
    column pruning still applies to the source scan.
    """
    have = {f.name: f for f in df.schema.fields}
    extra = [n for n in have if n not in {f.name for f in target.fields}]
    if strict and extra:
        raise ValueError(f"columns not in target schema: {extra}")
    cols = []
    for f in target.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(
                src.alias(f.name)
                if have[f.name].dataType == f.dataType
                else src.cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def union_evolving(dfs: list[DataFrame], target=None) -> DataFrame:
    """Union frames whose schemas drifted across pipeline versions:
    every input is aligned to ``target`` (default: the FIRST frame's
    schema, the declared contract) and unioned by name. The lazy
    counterpart of ``spark.read.parquet(...,
    mergeSchema)``-with-a-contract: later versions' extra columns drop,
    earlier versions' missing columns read as nulls, narrowed/widened
    types cast to the contract.
    """
    if not dfs:
        raise ValueError("union_evolving needs at least one frame")
    target = target or dfs[0].schema
    out = align_to_schema(dfs[0], target)
    for d in dfs[1:]:
        out = out.unionByName(align_to_schema(d, target))
    return out


def purpleair_clean(raw: DataFrame, utc_col: str = "UTCDateTime") -> DataFrame:
    """Full cleandata.py pipeline on an already-loaded DataFrame.

    Steps map 1:1 (SURVEY §3.2): timestamp coerce (cleandata.py:22),
    dropna (:24), UTC->Pacific (:27), sort (:29), 7-col projection
    (:32-42), round-3 on four measurement cols (:44-46), string render
    (:48). Returns the frame with PacificTime rendered as the output
    string, sorted — ready for ``csv_sink``.
    """
    ts = timestamp_parse_coerce(F.col(utc_col).cast("string"))
    cleaned = (
        raw.withColumn("_ts_utc", ts)
        .na.drop(subset=["_ts_utc"])
        .withColumn("PacificTime", utc_to_pacific(F.col("_ts_utc")))
        .orderBy("PacificTime")
        .select(
            F.date_format("PacificTime", "yyyy-MM-dd HH:mm:ss").alias("PacificTime"),
            *[F.col(c).try_cast("double").alias(c) for c in PURPLEAIR_MEASURE_COLS],
        )
    )
    return round_cols(cleaned, ROUND_COLS, 3)


PURPLEAIR_MEASURE_COLS = [c for c in PURPLEAIR_CLEAN_COLUMNS if c != "PacificTime"]


def csv_sink(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write CSV with header (cleandata.py:51-53).

    ``single_file`` mirrors pandas' one-file output for small results;
    at scale leave False so the write stays parallel.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)

"""Small-file compaction tests (sources/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.sources.maintenance import (
    compact_partitions,
)


def _files_of(base: str, part: str) -> set[str]:
    d = os.path.join(base, part)
    return {f for f in os.listdir(d) if f.endswith(".parquet")}


def test_compaction_rewrites_only_degenerate_partitions(spark, tmp_path):
    path = str(tmp_path / "facts")
    # two fragmented partitions (8 tiny files each), one healthy
    frag = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("d"),
        (F.col("id") * 2).alias("v"),
    )
    frag.repartition(8).write.partitionBy("d").parquet(path)
    healthy = spark.range(2000, 3000).select(
        F.col("id"), F.lit("9").alias("d"), (F.col("id") * 2).alias("v")
    )
    healthy.coalesce(1).write.mode("append").partitionBy("d").parquet(path)

    assert len(_files_of(path, "d=0")) == 8
    assert len(_files_of(path, "d=1")) == 8
    healthy_before = _files_of(path, "d=9")
    assert len(healthy_before) == 1

    before = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "d").collect()
    )

    report = compact_partitions(spark, path, "d", target_mb=256, small_file_mb=1.0)
    assert report.partitions_total == 3
    assert report.partitions_compacted == 2
    assert report.files_before == 17

    # fragmented partitions collapsed to one target-sized file each
    assert len(_files_of(path, "d=0")) == 1
    assert len(_files_of(path, "d=1")) == 1
    # the healthy partition was not rewritten — same physical files
    assert _files_of(path, "d=9") == healthy_before
    assert report.files_after == 3

    # content identical
    after = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "d").collect()
    )
    assert after == before

    # idempotent: a second run finds nothing to do
    report2 = compact_partitions(spark, path, "d", target_mb=256, small_file_mb=1.0)
    assert report2.partitions_compacted == 0
    assert report2.files_after == report2.files_before == 3


def test_compaction_noop_on_healthy_table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(100).select(
        F.col("id"), F.lit("a").alias("d")
    ).coalesce(1).write.partitionBy("d").parquet(path)
    files = _files_of(path, "d=a")
    report = compact_partitions(spark, path, "d", small_file_mb=1.0)
    assert report.partitions_compacted == 0
    assert _files_of(path, "d=a") == files

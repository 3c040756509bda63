"""Table maintenance: small-file compaction (SURVEY.md §4.2 layout).

Streaming ingest appends one file set per micro-batch
(streaming/ingest.py), so a partition that receives N micro-batches
holds >= N files. At 100 TB this is the classic small-file problem:
file-listing time grows linearly, every scan task opens many tiny
footers, and row-group-level pushdown degrades (statistics per tiny
file prune nothing). The fix is periodic compaction — rewrite only the
partitions whose file layout is bad, leaving healthy partitions
byte-identical (their files are never listed for rewrite, so
concurrent readers of other partitions are unaffected).

Compaction here is the engine-native dual of the reference's external
database doing its own vacuum: the parquet lake needs the engine to do
it. Policy + mechanism:

- a partition needs compaction when it holds more than one file AND
  its mean file size is under ``small_file_mb`` (many tiny appends);
- rewrite coalesces the partition to ``ceil(bytes / target_mb)``
  files via a repartition of just that partition's rows;
- the swap uses dynamic partition overwrite, so only the rewritten
  partitions' directories are replaced and the operation is idempotent
  (re-running compacts nothing the second time).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CompactionReport:
    partitions_total: int
    partitions_compacted: int
    files_before: int
    files_after: int


def _partition_file_stats(
    spark: SparkSession, path: str, partition_by: str
) -> dict[str, tuple[int, int]]:
    """{partition_value: (n_files, total_bytes)} via the Hadoop FS API
    (driver-side directory listing — the same cost any planner pays)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    stats: dict[str, tuple[int, int]] = {}
    for part_status in fs.listStatus(root):
        name = part_status.getPath().getName()
        if not name.startswith(f"{partition_by}="):
            continue
        n, total = 0, 0
        for f in fs.listStatus(part_status.getPath()):
            fname = f.getPath().getName()
            if fname.endswith(".parquet"):
                n += 1
                total += f.getLen()
        stats[name.split("=", 1)[1]] = (n, total)
    return stats


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: str,
    target_mb: int = 256,
    small_file_mb: float = 32.0,
) -> CompactionReport:
    """Compact the partitions of a ``partition_by``-partitioned parquet
    table whose file layout is degenerate. Returns a report of what was
    rewritten. Partitions already healthy are not read, not rewritten,
    and not listed in the overwrite (dynamic mode touches only the
    partitions present in the written frame)."""
    stats = _partition_file_stats(spark, path, partition_by)
    small = small_file_mb * 1024 * 1024
    bad = {
        pv: (n, total)
        for pv, (n, total) in stats.items()
        if n > 1 and total / n < small
    }
    files_before = sum(n for n, _ in stats.values())
    if not bad:
        return CompactionReport(len(stats), 0, files_before, files_before)

    df = spark.read.parquet(path)
    values = [pv for pv in bad]
    subset = df.filter(F.col(partition_by).cast("string").isin(values))
    # per-partition output file count: ceil(partition_bytes / target) —
    # most compacted partitions collapse to ONE file (they were small
    # by selection); a large backlog partition still splits into
    # target-sized files. The write is bucketed by (partition, bucket)
    # so each output task writes one file of one partition.
    n_out = F.lit(1)
    for pv, (_, total) in bad.items():
        n_out = F.when(
            F.col(partition_by).cast("string") == pv,
            math.ceil(total / (target_mb * 1024 * 1024)),
        ).otherwise(n_out)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_out)
    rewritten = subset.repartition(F.col(partition_by), bucket)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rewritten.write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = _partition_file_stats(spark, path, partition_by)
    return CompactionReport(
        partitions_total=len(stats),
        partitions_compacted=len(bad),
        files_before=files_before,
        files_after=sum(n for n, _ in after.values()),
    )

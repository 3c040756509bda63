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
import os
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
    # the isin literal list prunes the SCAN to the bad partitions (the
    # broadcast join below restricts rows too, but only the static
    # filter reaches the file listing)
    subset = df.filter(F.col(partition_by).cast("string").isin(values))
    # per-partition output file count: ceil(partition_bytes / target) —
    # most compacted partitions collapse to ONE file (they were small
    # by selection); a large backlog partition still splits into
    # target-sized files. The counts ride in as a broadcast-joined tiny
    # (partition -> n_out) frame, NOT a chained CASE WHEN per bad
    # partition — thousands of bad partitions would build a
    # thousands-deep expression tree (analyzer cost, codegen blowup);
    # the join keeps the plan constant-size at any backlog (r10 verdict
    # #6). The write is bucketed by (partition, bucket) so each output
    # task writes one file of one partition.
    n_out_map = spark.createDataFrame(
        [
            (pv, math.ceil(total / (target_mb * 1024 * 1024)) or 1)
            for pv, (_, total) in bad.items()
        ],
        "_pv string, _n_out int",
    )
    joined = subset.join(
        F.broadcast(n_out_map),
        subset[partition_by].cast("string") == n_out_map["_pv"],
    )
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.col("_n_out")
    )
    rewritten = joined.repartition(F.col(partition_by), bucket).drop(
        "_pv", "_n_out"
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rewritten.write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(path)
        )
    finally:
        # restore EXACTLY the prior state: a leaked 'dynamic' would
        # silently change later unrelated overwrite-partitionBy writes
        # from truncate-table to replace-present-partitions semantics.
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    after = _partition_file_stats(spark, path, partition_by)
    return CompactionReport(
        partitions_total=len(stats),
        partitions_compacted=len(bad),
        files_before=files_before,
        files_after=sum(n for n, _ in after.values()),
    )


@dataclass(frozen=True)
class ErasureReport:
    """What a right-to-erasure pass touched (and, as important, what it
    provably did not)."""

    rows_deleted: int
    fact_partitions_total: int
    fact_partitions_rewritten: int
    fact_partitions_removed: int
    rollup_dates_rewritten: int
    rollup_mode: str  # 'row-drop' | 'rebuild' | 'none'


def _overwrite_partitions(df, path: str, partition_by: str) -> None:
    """Dynamic-partition-overwrite write (the compact_partitions swap
    discipline): only the partitions present in ``df`` are replaced."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_by).parquet(path)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def _drop_partition_dirs(
    spark: SparkSession, path: str, partition_by: str, values: list[str]
) -> int:
    """Remove partition directories outright — dynamic overwrite cannot
    touch a partition for which the rewritten frame has ZERO rows, so a
    partition wholly owned by the erased subject must be deleted at the
    filesystem level or its data would silently survive."""
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    removed = 0
    for v in values:
        p = jvm.org.apache.hadoop.fs.Path(path, f"{partition_by}={v}")
        if fs.exists(p):
            fs.delete(p, True)
            removed += 1
    return removed


def _erase_marker_path(fact_path: str) -> str:
    # underscore-prefixed so parquet readers ignore it (the _SUCCESS
    # convention); lives under the fact path so the intent travels with
    # the table it mutates
    return os.path.join(fact_path, "_erase-intent.json")


def _write_erase_marker(fact_path: str, intent: dict) -> None:
    """Durable intent write: temp file + fsync + atomic rename, so a
    crash during the write itself can never leave a half-written
    marker that recovery would misread."""
    import json

    marker = _erase_marker_path(fact_path)
    tmp = marker + ".tmp"
    try:
        payload = json.dumps(intent)
    except TypeError as exc:
        raise ValueError(
            "erase_key: key_value (and rollup parameters) must be "
            "JSON-serializable so the erasure intent can be persisted "
            f"for crash recovery; got {intent.get('key_value')!r}"
        ) from exc
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)


def _read_erase_marker(fact_path: str) -> dict | None:
    import json

    marker = _erase_marker_path(fact_path)
    if not os.path.exists(marker):
        return None
    return json.load(open(marker))


def _repair_rollup(
    spark: SparkSession,
    fact_path: str,
    partition_by: str,
    rollup_path: str,
    rollup_keys: list[str],
    key_col: str,
    key_value,
    ts_col: str,
    value_col: str,
    distinct_col: str | None,
    touched_dates: list[str],
) -> str:
    """Phase 3: retract the subject from the materialized rollup,
    bounded by ``touched_dates`` (the subject's event-time spread,
    captured before its fact rows vanished). Two regimes, both
    IDEMPOTENT — safe to re-run from the intent marker after any crash:
    row-drop (subject is a rollup key: its rows are simply gone from
    the affected dates) and rebuild (non-retractable min/max/sketch
    partials: affected dates recomputed from the post-erasure facts).
    Returns the mode used."""
    from ..streaming.rollup import ROLLUP_PARTITION_COL, _merge, _partials

    roll = spark.read.parquet(rollup_path)
    in_dates = F.col(ROLLUP_PARTITION_COL).cast("string").isin(touched_dates)
    if key_col in rollup_keys:
        mode = "row-drop"
        subject = F.col(key_col).eqNullSafe(F.lit(key_value))
        kept_roll = roll.filter(in_dates).filter(~subject)
    elif not _partition_file_stats(spark, fact_path, partition_by):
        # the subject owned the ENTIRE fact table (every partition dir
        # is gone, only the intent marker remains) — nothing to rebuild
        # from; the repair reduces to dropping every touched date
        mode = "rebuild"
        kept_roll = roll.filter(F.lit(False))
    else:
        mode = "rebuild"
        post = spark.read.parquet(fact_path).filter(
            F.to_date(F.col(ts_col)).cast("string").isin(touched_dates)
        )
        kept_roll = _merge(
            _partials(post, rollup_keys, ts_col, value_col, distinct_col),
            rollup_keys,
        )
    kept_roll = kept_roll.localCheckpoint(eager=True)
    nonempty_dates = {
        str(r["_d"])
        for r in kept_roll.select(
            F.col(ROLLUP_PARTITION_COL).cast("string").alias("_d")
        )
        .distinct()
        .collect()
    }
    if nonempty_dates:
        _overwrite_partitions(
            kept_roll.filter(
                F.col(ROLLUP_PARTITION_COL).cast("string").isin(list(nonempty_dates))
            ),
            rollup_path,
            ROLLUP_PARTITION_COL,
        )
    _drop_partition_dirs(
        spark,
        rollup_path,
        ROLLUP_PARTITION_COL,
        [d for d in touched_dates if d not in nonempty_dates],
    )
    return mode


def _rewrite_partitions_without(
    spark: SparkSession,
    path: str,
    partition_by: str,
    subject,
    affected: list[str],
) -> tuple[int, int]:
    """Shared tail of BOTH erasure paths (facts and indexes): rewrite
    the affected partitions without the subject's rows (dynamic
    partition overwrite), removing wholly-owned partition dirs at the
    filesystem level. Idempotent: with the subject already gone, every
    affected partition rewrites to itself. The caller owns the subject
    predicate — it must be NULL-SAFE (a NULL id row must evaluate
    subject=False, never NULL, or ``~subject`` silently drops it from
    the rewrite). Returns (partitions_rewritten, partitions_removed)."""
    df = spark.read.parquet(path)
    kept = df.filter(
        F.col(partition_by).cast("string").isin(affected)
    ).filter(~subject)
    kept = kept.localCheckpoint(eager=True)  # plan reads the path it overwrites
    nonempty = {
        str(r["_pv"])
        for r in kept.select(F.col(partition_by).cast("string").alias("_pv"))
        .distinct()
        .collect()
    }
    if nonempty:
        _overwrite_partitions(
            kept.filter(F.col(partition_by).cast("string").isin(list(nonempty))),
            path,
            partition_by,
        )
    removed = _drop_partition_dirs(
        spark, path, partition_by, [pv for pv in affected if pv not in nonempty]
    )
    return len(nonempty), removed


def _erase_fact_rows(
    spark: SparkSession,
    fact_path: str,
    partition_by: str,
    key_col: str,
    key_value,
    affected: list[str],
) -> tuple[int, int]:
    """Phase 2 of ``erase_key``: the shared partition rewrite with the
    fact subject predicate (eqNullSafe — NULL-safe by construction)."""
    return _rewrite_partitions_without(
        spark,
        fact_path,
        partition_by,
        F.col(key_col).eqNullSafe(F.lit(key_value)),
        affected,
    )


def recover_erasure(spark: SparkSession, fact_path: str) -> ErasureReport | None:
    """Complete a crashed ``erase_key`` from its persisted intent
    marker. Returns None when no intent is pending; otherwise re-runs
    the unfinished phases with the MARKER's parameters (not the current
    caller's) and clears the marker.

    Every crash point converges: a crash before/mid phase 2 leaves
    subject rows that this pass re-locates and erases; a crash between
    phase 2 and phase 3 — the state that used to leave the subject's
    contribution in the rollup FOREVER (the retry found zero fact rows
    and skipped the repair) — is repaired from the marker's recorded
    ``touched_dates``; a crash after phase 3 just re-runs the
    idempotent repair and clears the marker. ``erase_key`` calls this
    at entry, so a plain re-run after any crash is the recovery."""
    intent = _read_erase_marker(fact_path)
    if intent is None:
        return None
    partition_by = intent["partition_by"]
    key_col, key_value = intent["key_col"], intent["key_value"]
    affected: list[str] = []
    rows_deleted = 0
    if _partition_file_stats(spark, fact_path, partition_by):
        facts = spark.read.parquet(fact_path)
        subject = F.col(key_col).eqNullSafe(F.lit(key_value))
        located = (
            facts.filter(subject)
            .groupBy(F.col(partition_by).cast("string").alias("_pv"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        affected = [r["_pv"] for r in located]
        rows_deleted = int(sum(r["_n"] for r in located))
    n_rewritten, n_removed = (
        _erase_fact_rows(spark, fact_path, partition_by, key_col, key_value, affected)
        if affected
        else (0, 0)
    )
    rollup_mode, rollup_dates = "none", 0
    if intent.get("rollup_path") is not None:
        rollup_mode = _repair_rollup(
            spark,
            fact_path,
            partition_by,
            intent["rollup_path"],
            intent["rollup_keys"],
            key_col,
            key_value,
            intent["ts_col"],
            intent["value_col"],
            intent.get("distinct_col"),
            intent["touched_dates"],
        )
        rollup_dates = len(intent["touched_dates"])
    os.remove(_erase_marker_path(fact_path))
    return ErasureReport(
        rows_deleted=rows_deleted,
        fact_partitions_total=len(
            _partition_file_stats(spark, fact_path, partition_by)
        ),
        fact_partitions_rewritten=n_rewritten,
        fact_partitions_removed=n_removed,
        rollup_dates_rewritten=rollup_dates,
        rollup_mode=rollup_mode,
    )


def erase_key(
    spark: SparkSession,
    fact_path: str,
    partition_by: str,
    key_col: str,
    key_value,
    rollup_path: str | None = None,
    rollup_keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    distinct_col: str | None = None,
) -> ErasureReport:
    """Right-to-erasure over the parquet lake: delete every fact row of
    one subject (``key_col = key_value``) by rewriting ONLY the
    partitions that contain it, then repair the materialized hourly
    rollup. The 100-TB discipline is what is NOT done: no full-table
    rewrite, no full rollup recompute, untouched partitions stay
    byte-identical (their files are never listed for rewrite).

    Phase 1 — locate: a column-pruned scan of (partition, key) finds the
    affected partitions and the subject's row count; parquet row-group
    min/max stats on ``key_col`` prune most files without reading data
    pages.

    Phase 2 — facts: affected partitions are re-read, the subject's
    rows filtered out (null-safe), and swapped in via dynamic partition
    overwrite. A partition wholly owned by the subject produces zero
    output rows — dynamic overwrite cannot replace it, so its directory
    is removed at the filesystem level.

    Phase 3 — rollup (when ``rollup_path`` is given): two regimes.
    If ``key_col`` is one of the rollup's grouping keys, the subject's
    contribution lives in its own rollup rows — retraction is a plain
    row-drop rewrite of the affected DATE partitions (cheap, no fact
    rescan). Otherwise sum/count partials would need subtraction but
    min/max and HLL sketches are NOT retractable, so the affected dates
    are REBUILT from the post-erasure facts — bounded by the subject's
    event-time spread, never the table.

    Crash recovery (r10 verdict #2): phases 2 and 3 are separate
    writes, so an intent marker (subject key + ``touched_dates`` +
    rollup parameters, ``_erase-intent.json`` under the fact path) is
    persisted BEFORE phase 2 and cleared only after phase 3 completes.
    Entry runs ``recover_erasure`` first: a leftover marker completes
    the unfinished phases with the MARKER's parameters — in particular
    the rollup repair still happens when a phase-2/phase-3 crash left
    zero subject fact rows, the state that previously made the
    subject's rollup contribution permanent. A plain re-run after any
    crash therefore converges to the fully-erased end state.
    """
    # Validate BEFORE any mutation: a rollup maintained with an HLL
    # distinct sketch must be rebuilt WITH it (rollup 'rebuild' regime),
    # and discovering that after the fact rows are already rewritten
    # would leave a half-done erasure. Fail loudly up front instead.
    if (
        rollup_path is not None
        and rollup_keys is not None
        and key_col not in rollup_keys
        and distinct_col is None
        and "distinct_sketch" in spark.read.parquet(rollup_path).columns
    ):
        raise ValueError(
            "erase_key: the rollup at %r carries a distinct_sketch "
            "column; pass distinct_col=<tracked column> so the "
            "rebuilt date partitions preserve it" % rollup_path
        )

    # complete any crashed prior erasure FIRST (its intent, its params)
    recover_erasure(spark, fact_path)

    facts = spark.read.parquet(fact_path)
    subject = F.col(key_col).eqNullSafe(F.lit(key_value))
    located = (
        facts.filter(subject)
        .groupBy(F.col(partition_by).cast("string").alias("_pv"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    affected = [r["_pv"] for r in located]
    rows_deleted = int(sum(r["_n"] for r in located))
    n_parts_total = len(_partition_file_stats(spark, fact_path, partition_by))
    if not affected:
        return ErasureReport(0, n_parts_total, 0, 0, 0, "none")

    # the subject's event-time spread, captured BEFORE the rows vanish
    touched_dates = [
        str(r["_d"])
        for r in facts.filter(subject)
        .select(F.to_date(F.col(ts_col)).alias("_d"))
        .distinct()
        .collect()
    ]

    # intent marker BEFORE the first mutation: everything phase 3 needs
    # survives the fact rows' disappearance
    _write_erase_marker(
        fact_path,
        {
            "partition_by": partition_by,
            "key_col": key_col,
            "key_value": key_value,
            "touched_dates": touched_dates,
            "rollup_path": rollup_path if rollup_keys is not None else None,
            "rollup_keys": rollup_keys,
            "ts_col": ts_col,
            "value_col": value_col,
            "distinct_col": distinct_col,
        },
    )

    n_rewritten, removed = _erase_fact_rows(
        spark, fact_path, partition_by, key_col, key_value, affected
    )

    rollup_mode = "none"
    rollup_dates = 0
    if rollup_path is not None and rollup_keys is not None:
        rollup_mode = _repair_rollup(
            spark, fact_path, partition_by, rollup_path, rollup_keys,
            key_col, key_value, ts_col, value_col, distinct_col,
            touched_dates,
        )
        rollup_dates = len(touched_dates)

    os.remove(_erase_marker_path(fact_path))
    return ErasureReport(
        rows_deleted=rows_deleted,
        fact_partitions_total=n_parts_total,
        fact_partitions_rewritten=n_rewritten,
        fact_partitions_removed=removed,
        rollup_dates_rewritten=rollup_dates,
        rollup_mode=rollup_mode,
    )


# --- unpartitioned index compaction ------------------------------------------
#
# The persisted indexes (operators/dedup_index.py bands/sigs,
# operators/decon_index.py bands/vecs) grow by APPEND-only extends —
# one file set per ingested shard. Months of shards re-create the
# small-file problem on the index itself: probe scans open thousands
# of tiny footers and the broadcast-probed groupBy reads degenerate
# row groups whose statistics prune nothing. compact_partitions above
# can't help (these tables are unpartitioned — there is no partition
# column to dynamically overwrite), and a plain mode("overwrite") of
# the same path is read-your-own-input AND leaves a crash window with
# the data deleted. This is the crash-safe rewrite for that layout.


@dataclass(frozen=True)
class DirCompactionReport:
    files_before: int
    files_after: int
    rows: int | None  # None = healthy noop (row count never computed)
    compacted: bool  # False = already healthy, nothing rewritten


def _dir_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_parquet_files, total_bytes) of one unpartitioned table dir."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    for f in fs.listStatus(root):
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += f.getLen()
    return n, total


def _recover_compaction(path: str) -> None:
    """Finish or roll back an interrupted compact_unpartitioned swap.

    States (staging = <path>.compact-staging, trash = <path>.compact-trash):
    - trash exists, path missing, staging complete  -> crash BETWEEN the
      two renames: finish (staging -> path), drop trash;
    - trash exists, path missing, staging gone/incomplete -> roll back
      (trash -> path);
    - trash exists, path exists -> crash after both renames: drop trash;
    - staging exists (path intact) -> crashed mid-write or pre-swap:
      drop staging; the caller re-runs the rewrite from the intact
      original either way.
    """
    import shutil

    staging = path + ".compact-staging"
    trash = path + ".compact-trash"
    staged_ok = os.path.exists(os.path.join(staging, "_SUCCESS"))
    if os.path.exists(trash):
        if not os.path.exists(path):
            if staged_ok:
                os.rename(staging, path)
            else:
                os.rename(trash, path)
        if os.path.exists(trash) and os.path.exists(path):
            shutil.rmtree(trash, ignore_errors=True)
    if os.path.exists(staging):
        shutil.rmtree(staging, ignore_errors=True)


def compact_unpartitioned(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    small_file_mb: float = 32.0,
) -> DirCompactionReport:
    """Compact an UNpartitioned append-grown parquet dir, crash-safely.

    Policy mirrors compact_partitions: rewrite when the dir holds more
    than one file AND the mean file size is under ``small_file_mb``;
    output ``ceil(bytes / target_mb)`` files via coalesce (narrow — no
    shuffle; a compaction is a rewrite, not a re-cluster). The rewrite
    lands fully in ``<path>.compact-staging`` and is row-count-verified
    against the original BEFORE any swap; the swap is two directory
    renames (original -> trash, staging -> original) with every crash
    point recoverable by ``_recover_compaction`` (run automatically at
    entry, so a re-run after ANY crash converges). Concurrent readers
    of the same path can observe a missing directory for the instant
    between the renames — run this in the ingest maintenance window,
    the same single-maintainer discipline landing-file retirement
    documents (deploy/compose.yaml).

    Local/posix paths only (the versioned.py::write_snapshot caveat:
    object stores need a manifest or conditional-put swap)."""
    import shutil

    if "://" in path and not path.startswith("file:"):  # pragma: no cover
        raise NotImplementedError(
            "compact_unpartitioned targets a local/posix path in this "
            "container; object stores need a manifest-based swap"
        )
    _recover_compaction(path)
    n_files, total = _dir_file_stats(spark, path)
    if n_files <= 1 or total / n_files >= small_file_mb * 1024 * 1024:
        # healthy noop costs a directory LISTING, never a table scan —
        # the maintenance pass over a 100-TB index must be free to run
        # on a schedule (rows=None: the count was never computed)
        return DirCompactionReport(n_files, n_files, None, False)

    rows_before = spark.read.parquet(path).count()
    staging = path + ".compact-staging"
    trash = path + ".compact-trash"
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(path).coalesce(n_out).write.parquet(staging)
    rows_staged = spark.read.parquet(staging).count()
    if rows_staged != rows_before:  # pragma: no cover - defensive
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch under {path}: "
            f"{rows_before} original vs {rows_staged} staged; "
            "original left untouched"
        )
    os.rename(path, trash)
    os.rename(staging, path)
    shutil.rmtree(trash, ignore_errors=True)
    n_after, _ = _dir_file_stats(spark, path)
    return DirCompactionReport(n_files, n_after, rows_before, True)


def compact_index(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    small_file_mb: float = 32.0,
) -> dict[str, DirCompactionReport]:
    """Compact every unpartitioned parquet subtable of a persisted
    index directory (dedup_index's bands/sigs, decon_index's
    bands/vecs). Subdirectories in partitioned layout (``key=value``
    children — e.g. vindex's cluster-partitioned vectors) are SKIPPED:
    their maintenance tool is compact_partitions, whose dynamic
    overwrite preserves the partition pruning the layout exists for.
    Probe results are unchanged by construction (same rows, fewer
    files); the lifecycle tests pin this."""
    out: dict[str, DirCompactionReport] = {}
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        if not os.path.isdir(sub) or name.endswith(
            (".compact-staging", ".compact-trash")
        ):
            continue
        children = os.listdir(sub)
        if any("=" in c and os.path.isdir(os.path.join(sub, c)) for c in children):
            continue  # partitioned layout -> compact_partitions territory
        if not any(c.endswith(".parquet") for c in children):
            continue
        out[name] = compact_unpartitioned(spark, sub, target_mb, small_file_mb)
    return out


# --- right-to-erasure for persisted indexes (r11) -----------------------------


@dataclass(frozen=True)
class IndexErasureReport:
    removed: dict[str, int]  # subtable -> rows removed
    partitions_rewritten: int  # partitioned subtables (vindex vectors)
    partitions_removed: int  # wholly-owned partition dirs deleted
    skipped: tuple[str, ...]  # subtables with no id column (aggregates)


def _null_safe_isin(id_col: str, ids: list):
    """Subject predicate for erasure: NULL ids are NEVER the subject.
    Bare ``isin`` is three-valued — NULL.isin(...) is NULL, and
    ``~NULL`` is NULL, so a filter(~subject) would silently DROP
    NULL-id rows from a rewrite (data loss) and break the staged
    row-count verification. ``isNotNull() & isin`` is equally
    null-safe (FALSE AND NULL = FALSE, so ~subject is TRUE for NULL
    ids) and — unlike a coalesce() wrapper, which Catalyst cannot
    translate to a data-source filter — keeps the footprint-locate
    scan eligible for parquet In/IsNotNull row-group pruning."""
    return F.col(id_col).isNotNull() & F.col(id_col).isin(ids)


def _erase_unpartitioned_rows(
    spark: SparkSession, path: str, ids: list, id_col: str
) -> int:
    """Staged filtered rewrite of one unpartitioned subtable (the
    compact_unpartitioned swap discipline — staging + trash renames,
    every crash state converged by ``_recover_compaction`` at entry).
    Row-count verified: staged == before - subject, or the original is
    left untouched. A zero-subject table is a NOOP detected by ONE
    aggregate scan (total + subject counts in the same job — no second
    pass). Returns rows removed."""
    import shutil

    _recover_compaction(path)
    df = spark.read.parquet(path)
    subject = _null_safe_isin(id_col, ids)
    counts = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(subject, 1).otherwise(0)).alias("s"),
    ).first()
    n_before, n_subject = int(counts["n"]), int(counts["s"] or 0)
    if n_subject == 0:
        return 0
    staging = path + ".compact-staging"
    trash = path + ".compact-trash"
    df.filter(~subject).write.parquet(staging)
    n_staged = spark.read.parquet(staging).count()
    if n_staged != n_before - n_subject:  # pragma: no cover - defensive
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"index erasure row-count mismatch under {path}: expected "
            f"{n_before - n_subject}, staged {n_staged}; original left "
            "untouched"
        )
    os.rename(path, trash)
    os.rename(staging, path)
    shutil.rmtree(trash, ignore_errors=True)
    return n_subject


def erase_from_index(
    spark: SparkSession,
    path: str,
    ids: list,
    id_cols: tuple[str, ...] = ("_id", "vec_id"),
) -> IndexErasureReport:
    """Right-to-erasure for a persisted index directory: remove every
    row carrying one of ``ids`` from every subtable that stores
    per-subject rows. ``erase_key`` scrubs the fact lake; a subject's
    data ALSO lives in the indexes built over it — dedup_index's
    bands/sigs, decon_index's bands/vecs (unpartitioned, id ``_id``),
    vindex's cluster-partitioned vectors (id ``vec_id``) — and an
    erasure that stops at the facts leaves the subject discoverable by
    every probe. ``ids`` is an erasure request: subject-sized and
    driver-known (the erase_key regime), shipped as an ``isin``
    literal.

    Mechanics per subtable, reusing the maintenance disciplines:

    - UNpartitioned: staged filtered rewrite with staging + trash
      renames and row-count verification (``_recover_compaction``
      converges every crash state at entry); zero-subject tables are
      noops that never rewrite a byte.
    - Partitioned (``key=value`` children): partition-SELECTIVE — the
      affected partitions come from a columnar (id, partition)
      projection, only they are rewritten via dynamic partition
      overwrite, and partitions wholly owned by the subject are
      removed at the filesystem level (dynamic overwrite cannot write
      an empty partition — the ``_erase_fact_rows`` lesson). Healthy
      partitions are never read or touched.
    - Subtables with NO id column (vindex's ``centroids``) are skipped
      and reported: trained centroids are statistical AGGREGATES
      (per-dimension means), not per-subject rows — the subject's
      residual influence on centroid coordinates is the same
      retractability question ``erase_key`` documents for sketch
      rollups; a caller under a strict interpretation rebuilds the
      index (``build_ivf_index``) after erasure.

    Ordering: unpartitioned DATA tables (sigs/vecs) are erased before
    their BAND tables — a crash in between leaves band rows whose
    verify rows are gone, which makes the subject UNREPORTABLE (the
    inner verify join drops it), i.e. the crash state already honors
    the erasure; the re-run cleans the rest. Idempotent throughout: a
    second run finds zero subject rows everywhere and touches nothing.

    Cost honesty: an UNpartitioned subtable has no subject-aligned
    layout, so a positive erase rewrites the WHOLE subtable (the
    noop check itself is only a columnar id scan). Batch erasure
    requests into one call where regulation allows — each call's
    rewrite cost is the subtable's size, not the request's; only the
    cluster-partitioned vectors table erases proportionally to the
    subject's footprint.
    """
    from ..io_utils import recover_staged_build

    # Converge any crashed staged BUILD first: a build that crashed
    # between commit_staged_build's renames can leave the complete OLD
    # index (subject's rows included) readable in <path>.build-trash —
    # a residue an erasure tool must clear, not leave for the next
    # build/extend to find.
    recover_staged_build(path)
    # ... and any crashed per-subtable COMPACT/ERASE rewrite: a kill
    # between that swap's two renames leaves the base dir MISSING and
    # only <sub>.compact-trash on disk — a listing that filters the
    # suffix dirs would silently skip the subtable (reporting success
    # while the subject's rows survive in trash), so recover every
    # base name the suffix dirs imply BEFORE listing subtables.
    for entry in os.listdir(path):
        if entry.endswith((".compact-staging", ".compact-trash")):
            _recover_compaction(
                os.path.join(path, entry.rsplit(".compact-", 1)[0])
            )
    sub_names = [
        n
        for n in os.listdir(path)
        if os.path.isdir(os.path.join(path, n))
        and not n.endswith((".compact-staging", ".compact-trash"))
    ]
    # bands LAST (see ordering note); alphabetical otherwise
    sub_names.sort(key=lambda n: (n == "bands", n))
    removed: dict[str, int] = {}
    skipped: list[str] = []
    parts_rewritten = 0
    parts_removed = 0
    for name in sub_names:
        sub = os.path.join(path, name)
        children = os.listdir(sub)
        partitioned = [
            c for c in children if "=" in c and os.path.isdir(os.path.join(sub, c))
        ]
        if not partitioned and not any(c.endswith(".parquet") for c in children):
            continue
        df = spark.read.parquet(sub)
        id_col = next((c for c in id_cols if c in df.columns), None)
        if id_col is None:
            skipped.append(name)
            continue
        if partitioned:
            partition_by = partitioned[0].split("=", 1)[0]
            subject = _null_safe_isin(id_col, ids)
            # ONE columnar scan yields both the affected partitions and
            # the subject row count
            per_part = (
                df.filter(subject)
                .groupBy(F.col(partition_by).cast("string").alias("_pv"))
                .count()
                .collect()
            )
            if any(r["_pv"] is None for r in per_part):
                # A NULL partition value would dodge BOTH downstream
                # mechanisms (the cast-string isin rewrite filter and
                # the key=value dir probe use the string form) — the
                # rows would survive while the report counted them as
                # removed. No index writer here emits NULL partitions;
                # refuse loudly rather than misreport.
                raise ValueError(
                    f"subject rows in {sub} carry a NULL "
                    f"{partition_by!r} partition value — this erasure "
                    "path cannot address the null partition "
                    "(__HIVE_DEFAULT_PARTITION__); rewrite the table "
                    "with a non-null partition key first"
                )
            affected = [str(r["_pv"]) for r in per_part]
            n_subject = sum(int(r["count"]) for r in per_part)
            removed[name] = n_subject
            if not affected:
                continue
            rw, rm = _rewrite_partitions_without(
                spark, sub, partition_by, subject, affected
            )
            parts_rewritten += rw
            parts_removed += rm
        else:
            removed[name] = _erase_unpartitioned_rows(spark, sub, ids, id_col)
    return IndexErasureReport(
        removed, parts_rewritten, parts_removed, tuple(skipped)
    )

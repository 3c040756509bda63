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


# Confs every load pins (best-effort: a locked-down session keeps its
# values and the NTZ expression fallback below still yields correct
# results, just without scan pushdown on timestamp predicates):
# - nanosAsLong: some testdata generations write TIMESTAMP(NANOS),
#   which the parquet reader otherwise rejects.
# - inferTimestampNTZ.enabled=false: naive (isAdjustedToUTC=0) parquet
#   timestamps are inferred as plain TIMESTAMP (LTZ, epoch = stored
#   micros read as UTC) instead of TIMESTAMP_NTZ. Keeping the column a
#   bare scan column is what preserves min/max row-group pushdown for
#   range predicates — an expression wrap (to_utc_timestamp/cast) lands
#   in DataFilters but NOT PushedFilters, turning every time-range
#   query into a full scan at 100 TB.
# - session.timeZone=UTC: makes the LTZ interpretation (and all
#   date_trunc/window/date_format derivations) match the DuckDB
#   oracle's naive-UTC reading regardless of the caller's session tz.
_LOAD_CONFS = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ("spark.sql.session.timeZone", "UTC"),
)


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    for k, v in _LOAD_CONFS:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down; NTZ fallback below keeps correctness
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # nanosAsLong read path: convert stored nanos to micros (floor —
        # same truncation DuckDB applies on read).
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _ntz_to_ltz(df)


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Fallback normalization of TIMESTAMP_NTZ columns to LTZ for
    sessions where ``spark.sql.parquet.inferTimestampNTZ.enabled``
    could not be set (then this is a no-op because the scan already
    yields LTZ).

    Note ``to_utc_timestamp(col, "UTC")`` first casts NTZ->LTZ via the
    SESSION timezone, so it pins the wall clock to UTC only because
    ``_read_table`` pins ``spark.sql.session.timeZone=UTC`` above; it
    is not session-independent on its own. Prefer the conf path: this
    expression wrap defeats parquet min/max pushdown on the column.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.to_utc_timestamp(F.col(c), "UTC"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TESTDATA_TABLES}


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multi-consumed intermediate and truncate lineage.

    Spark's exchange reuse only collapses IDENTICAL subplans; an
    intermediate consumed through different downstream aliases (e.g. a
    set table feeding both candidate generation and both verify sides
    of a similarity join) is re-evaluated per consumer — measured 7x
    wall-time inflation on the prefix-join at 200k docs. Checkpointing
    evaluates it exactly once.

    Uses RELIABLE ``checkpoint()`` when the session has a checkpoint
    dir (survives executor loss — the right mode for long cluster
    runs); falls back to ``localCheckpoint`` (executor-pinned blocks)
    otherwise. Same policy as connected_components' per-round
    truncation.

    ``eager=False`` truncates the lineage immediately but defers the
    materializing job to the FIRST downstream action — the right mode
    for driver-loop shapes (BPE rounds) where the next action is the
    very next statement: one job then both materializes the checkpoint
    and computes the round, instead of two back-to-back jobs per round.

    The deferral applies to ``localCheckpoint`` ONLY: a non-eager
    RELIABLE checkpoint writes its files via a separate recompute job
    after the first action (the RDD is not cached), so with a
    checkpoint dir configured ``eager=False`` would compute every
    frame twice — strictly worse than the extra eager job it was meant
    to save (r11 ADVICE). The checkpoint-dir branch therefore stays
    eager regardless of the flag.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=eager)


# --- staged index (re)builds --------------------------------------------------
#
# A persisted multi-table index (operators/dedup_index.py bands+sigs,
# operators/vindex.py centroids+vectors) cannot be REBUILT in place
# with two sequential overwrites: a crash between them leaves table A
# from the new build and table B from the old one — mutually
# inconsistent in a way every probe then trusts silently (new bands
# verified against old signatures; new centroids pruning old
# assignments). The fix is the compact_unpartitioned discipline
# (sources/maintenance.py): build EVERYTHING into <path>.build-staging,
# stamp a completion marker, then swap with two directory renames —
# every crash point is recovered by ``recover_staged_build`` at the
# next build/extend entry. Local/posix rename semantics (the same
# caveat as compaction: object stores need a manifest swap).

_STAGING_SUFFIX = ".build-staging"
_TRASH_SUFFIX = ".build-trash"
_BUILD_MARKER = "_BUILD_COMPLETE"


def begin_staged_build(path: str) -> str:
    """Start a staged (re)build: recover any prior crash state, then
    return a CLEAN staging dir the caller writes the whole index into."""
    import shutil

    recover_staged_build(path)
    staging = path + _STAGING_SUFFIX
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    return staging


def commit_staged_build(path: str) -> None:
    """Atomically (two renames) publish the staged build over ``path``.
    The completion marker is fsync'd BEFORE any rename, so recovery can
    always tell a finished staging from a half-written one."""
    import shutil

    staging = path + _STAGING_SUFFIX
    trash = path + _TRASH_SUFFIX
    marker = os.path.join(staging, _BUILD_MARKER)
    with open(marker, "w") as f:
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(path):
        os.rename(path, trash)
    os.rename(staging, path)
    shutil.rmtree(trash, ignore_errors=True)


def recover_staged_build(path: str) -> None:
    """Converge from ANY crash point of a staged build/swap:

    - trash exists, path missing, staging complete -> crash between the
      two renames: finish (staging -> path), drop trash;
    - trash exists, path missing, staging absent/incomplete -> roll
      back (trash -> path);
    - trash exists, path exists -> crash after both renames: drop trash;
    - staging complete, path missing, no trash -> fresh build crashed
      between marker and rename: finish it;
    - any other staging remnant -> drop it (the original — if any — is
      intact; the caller re-runs the build).
    """
    import shutil

    staging = path + _STAGING_SUFFIX
    trash = path + _TRASH_SUFFIX
    staged_ok = os.path.exists(os.path.join(staging, _BUILD_MARKER))
    if os.path.exists(trash):
        if not os.path.exists(path):
            if staged_ok:
                os.rename(staging, path)
            else:
                os.rename(trash, path)
        if os.path.exists(trash) and os.path.exists(path):
            shutil.rmtree(trash, ignore_errors=True)
    elif staged_ok and not os.path.exists(path):
        os.rename(staging, path)
    if os.path.exists(staging):
        shutil.rmtree(staging, ignore_errors=True)


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
    # Use the scan's file count as the width proxy instead of
    # df.rdd.getNumPartitions(): the latter materializes an RDD
    # conversion of the analyzed plan on the driver per call. File
    # count understates width when files exceed maxPartitionBytes
    # (splittable parquet), so it can only over-trigger the
    # repartition — harmless for the small inputs this guard targets,
    # and a no-op branch at 100 TB where inputs carry thousands of
    # files.
    try:
        width = len(df.inputFiles())
    except Exception:
        width = df.rdd.getNumPartitions()
    if width >= target:
        return df
    return df.repartition(target)


_APPEND_STAGING_SUFFIX = ".append-staging"
_APPEND_PENDING_MARKER = "_APPEND_PENDING"


def has_pending_append(path: str) -> bool:
    """True when a previous ``parallel_append_ordered`` publish crashed
    mid-rename: some tables hold the append's rows and later ones do
    not (the safe direction — earlier ⊇ later — but DETECTABLE now
    instead of silently absorbed by the probes' distinct semantics).
    Re-running the extend converges and clears the marker."""
    return os.path.exists(os.path.join(path, _APPEND_PENDING_MARKER))


def parallel_append_ordered(path: str, writes: list) -> None:
    """Append several frames to sibling tables of a persisted index
    with the COMPUTE in parallel and the PUBLISH in caller order.

    ``writes`` is an ordered list of ``(subdir, DataFrame)``. The
    expensive Spark write jobs land in an ephemeral staging dir
    CONCURRENTLY (guide §2.6 — independent jobs back-fill each other's
    stragglers instead of running back to back), then the publish is a
    sequence of per-file renames in the caller's order — so the
    crash-ordering invariant the old sequential appends provided
    (table N fully visible before table N+1 gains any row) holds at
    every PROCESS-crash point: a crash during staging publishes
    nothing, a crash between renames leaves earlier tables ⊇ later
    ones (the safe direction: an orphan sig/vec row is inert, the
    reverse silently drops candidates), and a leftover staging dir is
    deleted on the next entry. (Power-loss durability is NOT claimed:
    the destination directory is not fsync'd between tables, so
    renames may persist out of order across a power cut — the same
    posix-local scope as the staged build; object stores need a
    manifest swap.)

    A fsync'd ``_APPEND_PENDING`` marker brackets the publish window,
    so a crashed-mid-publish extend is DETECTABLE
    (``has_pending_append``) rather than only absorbed: appends stay
    retry-idempotent exactly as before — the probes' distinct-id
    bucket counts and distinct reports absorb duplicate rows from a
    crashed-then-retried extend, and Spark part file names are
    job-unique (UUID), so a retry's files never collide with a prior
    partial publish; the retry clears the marker after its own
    complete publish."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    staging = path + _APPEND_STAGING_SUFFIX
    shutil.rmtree(staging, ignore_errors=True)
    pending = os.path.join(path, _APPEND_PENDING_MARKER)
    try:
        with ThreadPoolExecutor(max_workers=max(len(writes), 1)) as pool:
            futures = [
                pool.submit(
                    lambda df=df, sub=sub: df.write.parquet(
                        os.path.join(staging, sub)
                    )
                )
                for sub, df in writes
            ]
            for f in futures:
                f.result()
        # publish window: marker on (fsync'd) -> ordered renames ->
        # marker off. Any crash inside the window leaves the marker.
        with open(pending, "w") as f:
            f.flush()
            os.fsync(f.fileno())
        for sub, _ in writes:
            src = os.path.join(staging, sub)
            dst = os.path.join(path, sub)
            for name in sorted(os.listdir(src)):
                if name.startswith("part-"):
                    os.rename(os.path.join(src, name), os.path.join(dst, name))
        os.remove(pending)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def ephemeral_dir(prefix: str) -> str:
    """Session-lifetime temp dir for queries that materialize real
    side state (index-lifecycle builds, streaming-replay landing/output
    dirs, rollup maintenance). The returned DataFrame lazily scans the
    dir, so it cannot be removed at query-build time — and an eager
    checkpoint would erase the plan evidence EXPLAIN.md exists to
    show; atexit bounds the residue to the process lifetime instead,
    so bench reps and driver sweeps clean up on exit rather than
    accumulating throwaway dirs under /tmp."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

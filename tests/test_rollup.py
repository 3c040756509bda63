"""Incremental rollup maintenance (streaming/rollup.py): associative
merge correctness, partition-selective rewrites, and the finalize view.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.io_utils import load
from meshtastic_airsensor_database_spark.streaming.rollup import (
    ROLLUP_PARTITION_COL,
    maintain_rollup,
    read_rollup,
)

KEYS = ["user_id", "event_type"]


def _direct(ev):
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), *KEYS)
        .agg(
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("value").alias("n"),
        )
    )


def _as_sorted_rounded(df):
    rows = df.select(
        "hour_ts", *KEYS, F.round("avg_value", 6).alias("a"),
        F.round("min_value", 6).alias("mn"), F.round("max_value", 6).alias("mx"), "n"
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_incremental_slices_equal_full_recompute(spark, sf_dir, tmp_path):
    """Four out-of-order micro-batch slices folded into the rollup must
    reproduce the one-pass aggregate exactly (associative merge)."""
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "hourly")
    for i in range(4):
        maintain_rollup(ev.filter(F.pmod("event_id", F.lit(4)) == i), path, keys=KEYS)
    got = _as_sorted_rounded(read_rollup(spark, path, KEYS))
    want = _as_sorted_rounded(_direct(ev))
    assert got == want


def test_tagged_slices_with_random_replays_equal_full_recompute(
    spark, sf_dir, tmp_path
):
    """Property over the r8 epoch-stamp guard: a deterministic pseudo-
    random schedule of slice folds where EVERY fold is replayed 0-2
    extra times with ITS OWN tag (the crash-then-redeliver shape) must
    still reproduce the one-pass aggregate exactly. The replays must be
    no-ops — without the guard each extra fold would double-count its
    slice. Also exercises affected_dates (the ingest fast path) on
    every fold."""
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "hourly_tagged")
    for i in range(4):
        batch = ev.filter(F.pmod("event_id", F.lit(4)) == i)
        dates = [r[0] for r in
                 batch.select(F.to_date(F.date_trunc("hour", "ts"))).distinct().collect()
                 if r[0] is not None]
        # fold once + (i % 3) replays with the SAME tag — the
        # redelivery schedule is deterministic but varied per slice
        for _ in range(1 + (i % 3)):
            maintain_rollup(
                batch, path, keys=KEYS,
                affected_dates=dates, epoch_tag=f"run0:{i}",
            )
    got = _as_sorted_rounded(read_rollup(spark, path, KEYS))
    want = _as_sorted_rounded(_direct(ev))
    assert got == want


def test_maintenance_rewrites_only_affected_date_partitions(spark, sf_dir, tmp_path):
    """A batch whose events land in one date must overwrite ONLY that
    date's partition directory — untouched dates keep their files
    byte-identical (dynamic partition overwrite, pruned merge read)."""
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "hourly")
    dates = sorted(
        r[0] for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(dates) >= 2, "testdata spans one date; pick a different slice"
    d0, d1 = dates[0], dates[-1]

    affected = maintain_rollup(ev, path, keys=KEYS)
    assert sorted(affected) == dates

    def part_files(date):
        pdir = os.path.join(path, f"{ROLLUP_PARTITION_COL}={date}")
        return {
            name: os.path.getmtime(os.path.join(pdir, name))
            for name in os.listdir(pdir)
            if name.endswith(".parquet")
        }

    before_d0 = part_files(d0)
    before_d1 = part_files(d1)

    late = ev.filter(F.to_date("ts") == F.lit(d1)).limit(50)
    affected = maintain_rollup(late, path, keys=KEYS)
    assert affected == [d1]
    assert part_files(d0) == before_d0  # untouched partition: same files
    assert part_files(d1) != before_d1  # affected partition: rewritten


def test_null_event_ts_rows_never_reach_the_rollup(spark, sf_dir, tmp_path):
    """Null event times are excluded on EVERY maintenance path (r8
    ADVICE): they have no prunable date, so their partials would land in
    __HIVE_DEFAULT_PARTITION__ — a partition the affected-date merge can
    never name (isin skips nulls), turning it into a last-batch-wins
    clobber. A mixed batch must fold only its timestamped rows, create
    no default partition, and an ALL-null batch must be a no-op."""
    ev = load(spark, sf_dir, "events").limit(400)
    nullify = F.when(F.pmod("event_id", F.lit(3)) == 0, None).otherwise(F.col("ts"))
    mixed = ev.withColumn("ts", nullify)
    path = str(tmp_path / "hourly")

    affected = maintain_rollup(mixed, path, keys=KEYS)
    assert all(d is not None for d in affected)
    assert not any("__HIVE_DEFAULT_PARTITION__" in n for n in os.listdir(path))
    want = _as_sorted_rounded(_direct(mixed.filter(F.col("ts").isNotNull())))
    assert _as_sorted_rounded(read_rollup(spark, path, KEYS)) == want

    # ALL-null batch: no affected dates, no fold, stored state unchanged
    assert maintain_rollup(mixed.withColumn("ts", F.lit(None).cast("timestamp")),
                           path, keys=KEYS) == []
    assert _as_sorted_rounded(read_rollup(spark, path, KEYS)) == want

    # the streaming fast path (caller-supplied affected_dates + tag)
    # excludes them identically — re-folding the SAME mixed batch with
    # its non-null dates and a fresh tag doubles only timestamped rows
    dates = [r[0] for r in mixed.filter(F.col("ts").isNotNull())
             .select(F.to_date("ts")).distinct().collect()]
    maintain_rollup(mixed, path, keys=KEYS, affected_dates=dates, epoch_tag="r:1")
    doubled = _as_sorted_rounded(read_rollup(spark, path, KEYS))
    assert [r[-1] for r in doubled] == [2 * r[-1] for r in want]


def test_empty_batch_is_noop(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "hourly")
    maintain_rollup(ev, path, keys=KEYS)
    want = _as_sorted_rounded(read_rollup(spark, path, KEYS))
    assert maintain_rollup(ev.filter(F.lit(False)), path, keys=KEYS) == []
    assert _as_sorted_rounded(read_rollup(spark, path, KEYS)) == want


def test_rollup_read_merge_is_partition_pruned(spark, sf_dir, tmp_path):
    """The merge's read of existing state must show the affected-dates
    filter in PartitionFilters — at scale the maintainer may never list
    the whole table."""
    import re

    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "hourly")
    maintain_rollup(ev, path, keys=KEYS)
    some_date = ev.select(F.to_date("ts")).first()[0]
    read = spark.read.parquet(path).filter(
        F.col(ROLLUP_PARTITION_COL).isin([some_date])
    )
    plan = read._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert re.search(rf"PartitionFilters: \[[^\]]*{ROLLUP_PARTITION_COL}", plan), plan


def test_sketch_maintenance_slice_order_independent(spark, tmp_path):
    import pyspark.sql.functions as F

    from meshtastic_airsensor_database_spark.streaming.rollup import (
        maintain_rollup,
        read_rollup,
    )

    rows = [
        # (event_id, hour offset, user, value); users repeat across slices
        (i, i % 3, i % 7, float(i)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "event_id long, h int, user_id long, value double").select(
        "event_id",
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)").alias("ts"),
        "user_id",
        "value",
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    # maintain from 3 interleaved slices vs one shot
    for i in range(3):
        maintain_rollup(df.filter(F.col("event_id") % 3 == i), p1, keys=[], distinct_col="user_id")
    maintain_rollup(df, p2, keys=[], distinct_col="user_id")
    a = {r["hour_ts"]: (r["distinct_est"], r["n"]) for r in read_rollup(spark, p1, []).collect()}
    b = {r["hour_ts"]: (r["distinct_est"], r["n"]) for r in read_rollup(spark, p2, []).collect()}
    assert a == b
    # sparse regime: estimates are exact
    exact = {
        r["hour_ts"]: r["d"]
        for r in df.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert {h: v[0] for h, v in a.items()} == exact


def test_serve_series_stats_routes_to_rollup_and_matches_raw(spark, tmp_path):
    """Day-grain series served from the hourly rollup must equal the
    raw-fact recompute EXACTLY, and the served plan must not list one
    raw-fact file; a sub-hour grain falls back to facts."""
    from meshtastic_airsensor_database_spark.streaming.rollup import (
        maintain_rollup,
        serve_series_stats,
    )

    facts_path = str(tmp_path / "facts")
    rollup_path = str(tmp_path / "rollup")
    rows = []
    for d in (1, 2):
        for h in (0, 1, 5):
            for u in (7, 8):
                rows.append((f"2024-02-0{d} 0{h}:15:00", u, float(d * 10 + h + u)))
                rows.append((f"2024-02-0{d} 0{h}:45:00", u, float(d + h)))
    facts = spark.createDataFrame(rows, "s string, user_id long, value double").select(
        F.to_timestamp("s").alias("ts"), "user_id", "value"
    )
    facts.write.parquet(facts_path)
    # fold in as two out-of-order slices (the maintenance path, not a
    # one-shot build)
    stored = spark.read.parquet(facts_path)
    maintain_rollup(stored.filter(F.dayofmonth("ts") == 2), rollup_path, keys=["user_id"])
    maintain_rollup(stored.filter(F.dayofmonth("ts") == 1), rollup_path, keys=["user_id"])

    served, source = serve_series_stats(
        spark, facts_path, rollup_path, keys=["user_id"], grain="day"
    )
    assert source == "rollup"
    assert all("rollup" in f for f in served.inputFiles())  # zero fact files

    direct = (
        stored.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"), "user_id")
        .agg(
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("value").alias("n"),
        )
    )

    def key(df):
        return {
            (str(r["bucket_ts"]), r["user_id"]): (
                round(r["avg_value"], 9), r["min_value"], r["max_value"], r["n"]
            )
            for r in df.collect()
        }

    assert key(served) == key(direct)

    _, source_min = serve_series_stats(
        spark, facts_path, rollup_path, keys=["user_id"], grain="minute"
    )
    assert source_min == "facts"


def test_serve_series_merges_distinct_sketches_to_grain(spark, tmp_path):
    """A sketch-bearing rollup served at day grain must union the
    hourly HLL sketches — the estimate equals a single-pass sketch of
    the raw rows' users for that day (identical sketch algebra), while
    still reading zero fact files."""
    from meshtastic_airsensor_database_spark.streaming.rollup import (
        maintain_rollup,
        serve_series_stats,
    )

    facts_path = str(tmp_path / "facts")
    rollup_path = str(tmp_path / "rollup")
    rows = []
    for h in (0, 1, 2):
        for u in range(20):
            rows.append((f"2024-03-01 0{h}:10:00", (h * 7 + u) % 30, 1.0))
    facts = spark.createDataFrame(rows, "s string, user_id long, value double").select(
        F.to_timestamp("s").alias("ts"), "user_id", "value"
    )
    facts.write.parquet(facts_path)
    stored = spark.read.parquet(facts_path)
    maintain_rollup(stored, rollup_path, keys=[], distinct_col="user_id")

    served, source = serve_series_stats(
        spark, facts_path, rollup_path, keys=[], grain="day"
    )
    assert source == "rollup"
    assert all("rollup" in f for f in served.inputFiles())
    got = served.collect()
    assert len(got) == 1
    direct = stored.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d")
    ).first()["d"]
    assert got[0]["distinct_est"] == direct

"""Mergeable HLL sketch rollups (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.sketch import (
    hll_partial_sketches,
    hll_rollup_estimate,
)


def _events(spark, n, dupe_every=3):
    return spark.range(n).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 17).alias("day"),
        (F.col("id") / dupe_every).cast("long").alias("user"),
    )


def test_merge_of_partials_equals_single_pass(spark):
    # Merging per-day partials must track a single-pass sketch of the
    # whole group. Beyond the sparse regime the DataSketches union
    # gadget (HLL_8 round-trip) may drift from the one-pass sketch by
    # a fraction of the ~1.6% rse, so assert closeness, not equality;
    # sparse-regime equality is asserted in test_exact_in_sparse_regime.
    df = _events(spark, 20000)
    partials = hll_partial_sketches(df, ["g"], "user", F.col("day"))
    merged = {
        r["g"]: r["distinct_est"]
        for r in hll_rollup_estimate(partials, ["g"]).collect()
    }
    single = {
        r["g"]: r["est"]
        for r in df.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("est"))
        .collect()
    }
    for g, est in merged.items():
        assert abs(est - single[g]) / single[g] < 0.05


def test_exact_in_sparse_regime(spark):
    df = _events(spark, 600)  # 200 distinct users, far below sparse cap
    partials = hll_partial_sketches(df, ["g"], "user", F.col("day"))
    got = {r["g"]: r for r in hll_rollup_estimate(partials, ["g"]).collect()}
    exact = {
        r["g"]: r["ex"]
        for r in df.groupBy("g").agg(F.countDistinct("user").alias("ex")).collect()
    }
    for g, row in got.items():
        assert row["distinct_est"] == exact[g]
        assert row["n_buckets"] == 17


def test_estimate_within_rsd_beyond_sparse(spark):
    df = spark.range(200_000).select(
        F.lit(0).alias("g"), (F.col("id") % 13).alias("day"), F.col("id").alias("user")
    )
    partials = hll_partial_sketches(df, ["g"], "user", F.col("day"))
    est = hll_rollup_estimate(partials, ["g"]).collect()[0]["distinct_est"]
    # lgConfigK=12 -> rse ~1.6%; allow 5 sigma
    assert abs(est - 200_000) / 200_000 < 0.08


# --- count-min sketch ---------------------------------------------------------


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    from meshtastic_airsensor_database_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    df = spark.range(3000).select((F.col("id") % 37).alias("k"))
    exact = df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))

    # Narrow sketch: estimates must never undercount (CMS guarantee).
    narrow = cms_counters(df, "k", depth=3, width=8)
    est = {
        r["k"]: r["est_n"]
        for r in cms_estimate(exact, narrow, "k", depth=3, width=8).collect()
    }
    ex = {r["k"]: r["exact_n"] for r in exact.collect()}
    assert set(est) == set(ex)
    for k, e in est.items():
        assert e >= ex[k]

    # Wide sketch (width >> distinct keys): every estimate is exact.
    wide = cms_counters(df, "k", depth=3, width=4096)
    est_w = {
        r["k"]: r["est_n"]
        for r in cms_estimate(exact, wide, "k", depth=3, width=4096).collect()
    }
    assert est_w == ex


def test_cms_counters_merge_elementwise(spark):
    # The 100-TB contract: counters built per-slice and SUMmed
    # element-wise equal the single-pass counter matrix, so per-day
    # sketches roll up to any horizon without rescanning.
    from meshtastic_airsensor_database_spark.operators.sketch import cms_counters

    df = spark.range(4000).select(
        (F.col("id") % 29).alias("k"), (F.col("id") % 2).alias("slice")
    )
    single = {
        (r["j"], r["bucket"]): r["c"]
        for r in cms_counters(df, "k", depth=3, width=16).collect()
    }
    merged = {}
    for s in (0, 1):
        part = cms_counters(
            df.filter(F.col("slice") == s), "k", depth=3, width=16
        )
        for r in part.collect():
            key = (r["j"], r["bucket"])
            merged[key] = merged.get(key, 0) + r["c"]
    assert merged == single


def test_cms_estimate_of_unseen_keys_never_drops_or_undercounts(spark):
    # Estimating a candidate set against ANOTHER slice's sketch (the
    # mergeable use): keys absent from the sketched slice must come
    # back (never silently dropped by the counter join) with est >= 0
    # = their true count — empty buckets read as 0, collisions only
    # overestimate.
    from meshtastic_airsensor_database_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    day1 = spark.range(1000).select((F.col("id") % 7).alias("k"))
    counters = cms_counters(day1, "k", depth=3, width=8)
    unseen = spark.range(100, 107).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("exact_n")
    )
    est = cms_estimate(unseen, counters, "k", depth=3, width=8).collect()
    assert len(est) == 7          # nothing dropped
    assert all(r["est_n"] >= 0 for r in est)

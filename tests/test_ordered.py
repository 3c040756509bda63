"""operators/ordered.py — partition-offset global rank / NTILE /
prefix sums must be value-identical to the single-partition window
functions they replace (rfm_segments, pareto_user_share)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.ordered import (
    global_ntile,
    global_rank_cumsum,
    global_row_number,
    ntile_from_rank,
)


def _frame(spark, n=5000):
    # deterministic, duplicate-heavy metric so ties exercise the
    # tie-break key, spread over every partition
    return spark.range(n).select(
        F.col("id").alias("k"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
            .cast("long")
            % 97
        ).alias("metric"),
    ).repartition(16)


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    got, total, _ = global_row_number(
        df, [F.col("metric").desc(), F.col("k").asc()], "rn"
    )
    assert total == 5000
    w = Window.orderBy(F.desc("metric"), "k")
    want = df.select("k", F.row_number().over(w).alias("rn"))
    assert got.select("k", "rn").subtract(want).count() == 0
    assert want.subtract(got.select("k", "rn")).count() == 0


def test_ntile_formula_matches_sql_ntile_all_remainders(spark):
    # n % t covers every remainder class, including n < t
    for n in (1, 2, 3, 7, 8, 9, 40, 41, 42, 43):
        df = spark.range(n).select(F.col("id").alias("k"))
        w = Window.orderBy("k")
        want = df.select(
            "k", F.ntile(4).over(w).alias("t"), F.row_number().over(w).alias("rn")
        )
        rows = want.collect()
        for row in rows:
            got = None
            # evaluate the pure formula via a 1-row select
            got = (
                spark.range(1)
                .select(ntile_from_rank(F.lit(row["rn"]), 4, n).alias("t"))
                .collect()[0]["t"]
            )
            assert got == row["t"], (n, row["rn"], got, row["t"])


def test_global_ntile_matches_window_ntile(spark):
    df = _frame(spark, 4003)  # remainder 3 over 4 tiles
    got, _ = global_ntile(df, [F.col("metric").asc(), F.col("k").asc()], 4, "tile")
    w = Window.orderBy("metric", "k")
    want = df.select("k", F.ntile(4).over(w).alias("tile"))
    assert got.select("k", "tile").subtract(want).count() == 0
    assert want.subtract(got.select("k", "tile")).count() == 0


def test_global_rank_cumsum_matches_window(spark):
    df = _frame(spark, 3000)
    got, total = global_rank_cumsum(
        df, [F.col("metric").desc(), F.col("k").asc()], "metric",
        rank_col="rnk", cum_col="cum",
    )
    w = Window.orderBy(F.desc("metric"), "k")
    want = df.select(
        "k",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("metric").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    assert total == df.agg(F.sum("metric")).collect()[0][0]
    assert got.select("k", "rnk", "cum").subtract(want).count() == 0
    assert want.subtract(got.select("k", "rnk", "cum")).count() == 0


def test_global_rank_cumsum_null_sum_counts_as_zero(spark):
    """A NULL-bearing integral sum_col must NOT corrupt the running sum:
    nulls arrive in the Arrow pass as a float64 NaN array whose int64
    cast is undefined — the kernel fills nulls with 0, matching the
    NULL-skipping F.sum in the offsets pass (and SQL window SUM)."""
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 != 0, F.col("id") % 13).cast("long").alias("metric"),
    )
    got, total = global_rank_cumsum(df, [F.col("k").asc()], "metric")
    w = Window.orderBy("k")
    want = df.select(
        "k",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum(F.coalesce("metric", F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    assert total == df.agg(F.sum("metric")).collect()[0][0]
    assert got.select("k", "rank", "cum").subtract(want).count() == 0
    assert want.subtract(got.select("k", "rank", "cum")).count() == 0


def test_global_rank_cumsum_rejects_float_sum_col(spark):
    df = spark.range(10).select(F.col("id").alias("k"), F.rand(7).alias("v"))
    import pytest

    with pytest.raises(ValueError, match="integral"):
        global_rank_cumsum(df, [F.col("k").asc()], "v")


def test_ordered_machinery_property(spark):
    """Property check across adversarial shapes: heavy duplicates, tiny
    frames, n < tiles, and partition counts that don't divide the data
    — rank, NTILE and running sums must match the window functions on
    every one."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        n=st.integers(min_value=1, max_value=400),
        mod=st.integers(min_value=1, max_value=9),
        parts=st.integers(min_value=1, max_value=7),
        tiles=st.integers(min_value=1, max_value=5),
    )
    def check(n, mod, parts, tiles):
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
                .cast("long")
                % mod
            ).alias("metric"),
        ).repartition(parts)
        order = [F.col("metric").desc(), F.col("k").asc()]
        w = Window.orderBy(F.desc("metric"), "k")
        got_t, _ = global_ntile(df, order, tiles, "t")
        want_t = df.select("k", F.ntile(tiles).over(w).alias("t"))
        assert got_t.select("k", "t").subtract(want_t).count() == 0
        got_rc, total = global_rank_cumsum(df, order, "metric")
        want_rc = df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rank"),
            F.sum("metric").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        )
        assert got_rc.select("k", "rank", "cum").subtract(want_rc).count() == 0
        assert total == (df.agg(F.sum("metric")).collect()[0][0] or 0)

    check()

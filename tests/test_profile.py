"""One-pass table profiler (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.profile import profile_columns


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, None),
            (2, "a", None, None),
            (None, "b", 3.5, None),
            (4, None, 3.5, None),
        ],
        "k long, s string, v double, z string",
    )


def test_profile_exact(spark):
    got = {r["column"]: r for r in profile_columns(_df(spark)).collect()}
    assert set(got) == {"k", "s", "v", "z"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["k"]["n_null"], got["k"]["n_distinct"]) == (1, 3)
    assert (got["k"]["min_num"], got["k"]["max_num"]) == (1.0, 4.0)
    assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
    assert got["s"]["min_num"] is None  # non-numeric: no range
    assert (got["v"]["n_null"], got["v"]["n_distinct"]) == (1, 2)
    assert (got["v"]["min_num"], got["v"]["max_num"]) == (1.5, 3.5)
    assert (got["z"]["n_null"], got["z"]["n_distinct"]) == (4, 0)


def test_profile_approx_matches_exact_at_small_cardinality(spark):
    exact = {r["column"]: r["n_distinct"] for r in profile_columns(_df(spark)).collect()}
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_columns(_df(spark), approx=True).collect()
    }
    assert exact == approx  # HLL is exact in the sparse regime


def test_profile_timestamp_range_is_epoch(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 00:00:00",)], "t string"
    ).select(F.to_timestamp("t").alias("t"))
    got = profile_columns(df).collect()[0]
    assert got["max_num"] - got["min_num"] == 86400.0


def test_content_checksum_order_insensitive_and_value_sensitive(spark):
    from meshtastic_airsensor_database_spark.operators.profile import (
        table_content_checksum,
    )

    rows = [(1, "a"), (2, "b"), (3, "c")]
    a = spark.createDataFrame(rows, "k int, v string")
    b = spark.createDataFrame(list(reversed(rows)), "k int, v string").repartition(3)
    ca = table_content_checksum(a, "t", ["k", "v"]).collect()[0]
    cb = table_content_checksum(b, "t", ["k", "v"]).collect()[0]
    assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)

    # flipping a single value must change the checksum
    c = spark.createDataFrame([(1, "a"), (2, "b"), (3, "d")], "k int, v string")
    cc = table_content_checksum(c, "t", ["k", "v"]).collect()[0]
    assert cc.checksum != ca.checksum
    # ...and duplicate-pair xor cancellation is why n_rows is part of
    # the contract: two identical extra rows xor to a no-op
    d = spark.createDataFrame(rows + [(9, "z"), (9, "z")], "k int, v string")
    cd = table_content_checksum(d, "t", ["k", "v"]).collect()[0]
    assert cd.checksum == ca.checksum and cd.n_rows != ca.n_rows


def test_content_checksum_null_semantics_match_duckdb(spark, tmp_path):
    """NULL vs empty string vs shifted-NULL must all checksum
    differently, and the Spark checksum must equal the DuckDB twin's
    even WITH nulls (the canonical form is NULL-safe on both sides)."""
    import duckdb
    import pandas as pd

    from meshtastic_airsensor_database_spark.operators.profile import (
        table_content_checksum,
    )
    from meshtastic_airsensor_database_spark.plans.relational import _checksum_sql

    pdf = pd.DataFrame({"k": [1, 2, 3], "v": [None, "", "x"]})
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)

    df = spark.read.parquet(path)
    got = table_content_checksum(df, "t", ["k", "v"]).collect()[0]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = con.execute(_checksum_sql("t", ["k", "v"])).fetchone()
    assert (got.n_rows, got.checksum) == (want[1], want[2])

    # NULL, empty and value-shifted rows are all distinct contents
    variants = [
        pd.DataFrame({"k": [1, 2, 3], "v": ["", "", "x"]}),   # NULL -> empty
        pd.DataFrame({"k": [None, 2, 3], "v": ["1", "", "x"]}),  # NULL shifts col
    ]
    sums = {got.checksum}
    for i, vdf in enumerate(variants):
        p = str(tmp_path / f"v{i}.parquet")
        vdf.to_parquet(p)
        c = table_content_checksum(
            spark.read.parquet(p), "t", ["k", "v"]
        ).collect()[0]
        sums.add(c.checksum)
    assert len(sums) == 3

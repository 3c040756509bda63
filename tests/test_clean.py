"""cleandata.py-parity batch ETL tests (SURVEY §3.2)."""

from __future__ import annotations

from meshtastic_airsensor_database_spark.operators.clean import (
    multi_file_union,
    purpleair_clean,
)


def _raw(spark):
    rows = [
        ("2024-01-15 12:00:00", "68.0", "40.0", "1012.3456", "1.23456", "2.5", "10.0"),
        ("not-a-date", "70.0", "41.0", "1000.0", "1.0", "2.0", "3.0"),  # dropped
        ("2024-01-15 11:00:00", "66.2", "39.0", "1011.0", "0.5", "1.5", "9.0"),
    ]
    return spark.createDataFrame(
        rows,
        ["UTCDateTime", "current_temp_f", "current_humidity", "pressure",
         "pm1_0_atm", "pm2_5_atm", "pm10_0_atm"],
    )


def test_purpleair_clean_pipeline(spark):
    out = purpleair_clean(_raw(spark)).collect()
    # unparseable timestamp dropped (to_datetime errors='coerce' + dropna)
    assert len(out) == 2
    # sorted by PacificTime ascending; UTC noon -> 04:00 PST (Jan = UTC-8)
    assert [r.PacificTime for r in out] == ["2024-01-15 03:00:00", "2024-01-15 04:00:00"]
    by_time = {r.PacificTime: r for r in out}
    r12 = by_time["2024-01-15 04:00:00"]
    assert r12.pressure == 1012.346  # round(3) on the four measure cols
    assert r12.pm1_0_atm == 1.235
    assert r12.current_temp_f == 68.0  # temp NOT rounded (cleandata.py:44-46)


def test_multi_file_union(spark, tmp_path):
    import csv

    for i, rows in enumerate([[("1", "a")], [("2", "b")]]):
        with open(tmp_path / f"f{i}.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["x", "y"])
            w.writerows(rows)
    df = multi_file_union(spark, [str(tmp_path / "f0.csv"), str(tmp_path / "f1.csv")])
    assert df.count() == 2
    assert set(df.columns) == {"x", "y"}


def test_align_to_schema_nulls_casts_and_drops(spark):
    from pyspark.sql import types as T

    from meshtastic_airsensor_database_spark.operators.clean import align_to_schema

    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("c", T.StringType()),
    ])
    v2 = spark.createDataFrame([(1, 2.5, True)], "a int, b double, x boolean")
    got = align_to_schema(v2, target)
    assert got.schema == target
    row = got.first()
    assert (row["a"], row["b"], row["c"]) == (1, 2.5, None)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in target"):
        align_to_schema(v2, target, strict=True)


def test_union_evolving_mixed_parquet_versions(spark, tmp_path):
    """Files written by three pipeline versions (missing column, extra
    column, narrower int type) union cleanly under the v1 contract."""
    from pyspark.sql import functions as F

    from meshtastic_airsensor_database_spark.operators.clean import union_evolving

    v1 = spark.createDataFrame([(1, 10.0, "en")], "id long, score double, lang string")
    v0 = spark.createDataFrame([(2, 20.0)], "id int, score double")          # no lang yet
    v2 = spark.createDataFrame([(3, 30.0, "de", 7)],
                               "id long, score double, lang string, extra int")
    for name, df in (("v1", v1), ("v0", v0), ("v2", v2)):
        df.write.parquet(str(tmp_path / name))
    frames = [spark.read.parquet(str(tmp_path / n)) for n in ("v1", "v0", "v2")]
    got = union_evolving(frames, target=v1.schema)
    assert got.schema == v1.schema
    rows = {r["id"]: (r["score"], r["lang"]) for r in got.collect()}
    assert rows == {1: (10.0, "en"), 2: (20.0, None), 3: (30.0, "de")}

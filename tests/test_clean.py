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

"""Z-order layout (sources/layout.py): interleave correctness and the
actual pruning payoff — per-file min/max footprints must shrink on
EVERY z-ordered dimension vs an unclustered write."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.io_utils import load
from meshtastic_airsensor_database_spark.sources.layout import (
    write_zordered,
    zorder_value,
)


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of ``col`` per parquet file, from the footers only."""
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((float(mn), float(mx)))
    return spans


def _avg_span_fraction(path: str, col: str, lo: float, hi: float) -> float:
    spans = _file_spans(path, col)
    width = hi - lo
    return sum((mx - mn) / width for mn, mx in spans) / len(spans)


def test_zorder_value_is_deterministic_and_bounded(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z = zorder_value(ev, ["user_id", "value"], bits=8)
    out = ev.withColumn("z", z)
    mn, mx = out.agg(F.min("z"), F.max("z")).first()
    assert 0 <= mn and mx < (1 << 16)
    a = sorted(r["z"] for r in out.collect())
    b = sorted(r["z"] for r in ev.withColumn(
        "z", zorder_value(ev, ["user_id", "value"], bits=8)).collect())
    assert a == b


def test_zorder_rejects_bit_overflow(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="overflows"):
        zorder_value(ev, ["user_id", "value"], bits=40)
    with pytest.raises(ValueError, match="at least one"):
        zorder_value(ev, [])


def test_zordered_files_are_compact_in_both_dimensions(spark, sf_dir, tmp_path):
    """After z-ordering on (user_id, epoch), the average per-file
    min/max footprint must be a small fraction of the full domain in
    BOTH dimensions — that fraction is exactly the expected share of
    files a point/range filter on either column has to read. A plain
    unclustered write leaves ~full-domain footprints (no file can be
    skipped on any column)."""
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", F.col("ts").cast("long").alias("epoch"))
    )
    lo_u, hi_u, lo_e, hi_e = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("epoch"), F.max("epoch")
    ).first()

    plain = str(tmp_path / "plain")
    ev.repartition(8).write.parquet(plain)  # round-robin: no clustering
    zpath = str(tmp_path / "zord")
    write_zordered(ev, zpath, ["user_id", "epoch"], n_files=8)

    assert ev.count() == spark.read.parquet(zpath).count()

    plain_u = _avg_span_fraction(plain, "user_id", lo_u, hi_u)
    plain_e = _avg_span_fraction(plain, "epoch", lo_e, hi_e)
    z_u = _avg_span_fraction(zpath, "user_id", lo_u, hi_u)
    z_e = _avg_span_fraction(zpath, "epoch", lo_e, hi_e)

    # unclustered files span ~the whole domain on both columns
    assert plain_u > 0.9 and plain_e > 0.9
    # z-ordered files cover compact rectangles on BOTH columns at once
    assert z_u <= 0.6, (z_u, plain_u)
    assert z_e <= 0.6, (z_e, plain_e)
    # and the clustering is a real multiple, not rounding luck
    assert z_u < plain_u / 1.5 and z_e < plain_e / 1.5

"""Blocked fuzzy entity matching (operators/entity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.entity import blocked_fuzzy_match


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "b1", "acme corp"), (2, "b1", "acme  corp"), (3, "b2", "zebra ltd")],
        "id long, blk string, name string",
    )
    right = spark.createDataFrame(
        [(10, "b1", "acme corp"), (11, "b2", "zzzzz ltd"), (12, "b3", "acme corp")],
        "id long, blk string, name string",
    )
    return left, right


def test_match_within_block_only(spark):
    left, right = _frames(spark)
    got = blocked_fuzzy_match(
        left, right,
        left_key=F.col("id"), right_key=F.col("id"),
        left_block=F.col("blk"), right_block=F.col("blk"),
        left_name=F.col("name"), right_name=F.col("name"),
        max_distance=2,
    ).collect()
    pairs = {(r["left_key"], r["right_key"]): r for r in got}
    # exact match and 1-edit match inside b1; right id=12 matches the
    # name but sits in a different block -> never compared
    assert set(pairs) == {(1, 10), (2, 10)}
    assert pairs[(1, 10)]["distance"] == 0
    assert pairs[(1, 10)]["similarity"] == 1.0
    assert pairs[(2, 10)]["distance"] == 1


def test_distance_threshold_filters(spark):
    left, right = _frames(spark)
    got = blocked_fuzzy_match(
        left, right,
        left_key=F.col("id"), right_key=F.col("id"),
        left_block=F.col("blk"), right_block=F.col("blk"),
        left_name=F.col("name"), right_name=F.col("name"),
        max_distance=0,
    ).collect()
    assert {(r["left_key"], r["right_key"]) for r in got} == {(1, 10)}


def test_max_block_caps_fanout(spark):
    left = spark.createDataFrame(
        [(i, "hot", f"name{i}") for i in range(20)], "id long, blk string, name string"
    )
    right = spark.createDataFrame([(99, "hot", "name0")], "id long, blk string, name string")
    got = blocked_fuzzy_match(
        left, right,
        left_key=F.col("id"), right_key=F.col("id"),
        left_block=F.col("blk"), right_block=F.col("blk"),
        left_name=F.col("name"), right_name=F.col("name"),
        max_distance=100,
        max_block=5,
    ).collect()
    # deterministic first-5 by key survive the cap
    assert sorted(r["left_key"] for r in got) == [0, 1, 2, 3, 4]

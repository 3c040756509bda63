"""Bucketed range (interval) join.

Joining points to enclosing time intervals (``e.ts BETWEEN i.start AND
i.end``) is a theta join: Spark plans it as BroadcastNestedLoopJoin
when one side is small, and a full cartesian when neither is — the
classic 100-TB scale killer. This operator implements the standard
chunked-interval equi-join reduction: slice time into fixed buckets,
explode each interval over the buckets it covers (bounded fan-out:
``interval_span / bucket + 1`` rows per interval), equi-join points on
(optional key, bucket), then apply the exact range predicate.

The shuffle is a plain hash exchange on (key, bucket) — AQE-coalesced
and skew-splittable — instead of a nested loop. Each point lands in
exactly one bucket, so a (point, interval) pair meets at most once: no
post-join dedup. Pick ``bucket_seconds`` near the typical interval
span so fan-out stays at 1-2 buckets per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timegrid import time_bucket


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Equi-join reduction of ``points.ts BETWEEN intervals.start AND
    intervals.end`` (inclusive both ends), optionally co-keyed on
    ``on`` columns (e.g. the node/user id).

    Returns points columns + interval columns (minus the helper
    bucket). Fan-out guard: intervals longer than ~1000 buckets should
    use a larger ``bucket_seconds``; the explode is linear in
    ``span / bucket_seconds`` per interval.
    """
    on = on or []
    # Outer semantics survive only because the range predicate is part
    # of the JOIN CONDITION (a post-join .where() would drop
    # null-extended rows, silently degrading to inner). Interval-side
    # outer joins are still unsupported: the explode would emit one
    # null-extended row per covered bucket for an unmatched interval.
    allowed = {"inner", "left", "left_outer"}
    if how not in allowed:
        raise ValueError(
            f"bucketed_range_join supports how in {sorted(allowed)}, got {how!r}: "
            "interval-side outer joins would duplicate unmatched intervals "
            "once per exploded bucket"
        )
    # Interval side: one row per covered bucket. cast-to-long floors
    # sub-second timestamps; monotonicity of floor guarantees a point
    # inside [start, end] has its bucket inside [bucket(start),
    # bucket(end)] — no boundary misses.
    #
    # Both sides are explicitly aliased and the condition is built from
    # qualified refs: when points and intervals derive from the same
    # DataFrame (self-join, e.g. events joined to event-derived
    # intervals), unqualified pt[c] == iv[c] carries identical
    # expression IDs — the fragile ambiguity Spark resolves only
    # heuristically via dataset ids.
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                time_bucket(F.col(start_col), bucket_seconds),
                time_bucket(F.col(end_col), bucket_seconds),
            )
        ),
    ).alias("_iv")
    pt = points.withColumn(
        "_bucket", time_bucket(F.col(point_ts), bucket_seconds)
    ).alias("_pt")
    cond = (
        [F.col("_pt._bucket") == F.col("_iv._bucket")]
        + [F.col(f"_pt.{c}") == F.col(f"_iv.{c}") for c in on]
        + [
            F.col(f"_pt.{point_ts}") >= F.col(f"_iv.{start_col}"),
            F.col(f"_pt.{point_ts}") <= F.col(f"_iv.{end_col}"),
        ]
    )
    joined = pt.join(iv, cond, how)
    keep = [F.col(f"_pt.{c}") for c in points.columns] + [
        F.col(f"_iv.{c}") for c in intervals.columns if c not in set(on)
    ]
    return joined.select(*keep)

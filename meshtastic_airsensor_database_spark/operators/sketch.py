"""Mergeable-sketch rollups: incremental distinct counting via
Apache DataSketches HLL (Spark 4 built-ins ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``).

Why this is a first-class 100-TB pattern: exact COUNT(DISTINCT) over a
sliding horizon must re-scan the horizon on every refresh, because
exact distinct counts do not merge. HLL sketches DO merge (register-
wise max), so a pipeline materializes one small fixed-size sketch per
(key, day) partition ONCE, and every horizon/rollup query afterwards
unions pre-built sketches — the same partial-aggregate shape the
incremental hourly rollup (streaming/rollup.py) uses for associative
aggs, extended to the one aggregate that is not associative in exact
form. Merging per-partition sketches is exact in the sparse (coupon)
regime and near-lossless beyond it: the DataSketches union operator
routes through an HLL_8 gadget, so union-of-partials can differ from
a single-pass sketch by a fraction of the published error bound —
property-tested at both regimes in tests/test_sketch.py.

Accuracy contract: a DataSketches HLL (lgConfigK=12 default) stays in
EXACT sparse mode until roughly the low hundreds of distinct items,
then switches to estimation with ~1.6% relative standard error. The
registered oracle query leans on the first regime (oracle-scale
cardinalities sit far below the sparse threshold, so estimate ==
exact); at larger scale the same plan returns estimates within the
published rsd — asserted with a tolerance test instead of an oracle.

Reference parity: the reference engine has no sketch surface (it
counts nodes exactly in pandas, graphdata.py); this is extension
surface for the telemetry/curation pipelines the engine targets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial_sketches(
    df: DataFrame,
    keys: Sequence[str],
    entity: str,
    bucket: Column,
    bucket_name: str = "bucket",
) -> DataFrame:
    """One HLL sketch of ``entity`` per (keys..., bucket) — the
    materializable partial. Map-side combine applies (sketch agg is
    partial-able), so the shuffle carries one small sketch per
    partition-and-group, never entity values."""
    return df.groupBy(*keys, bucket.alias(bucket_name)).agg(
        F.hll_sketch_agg(entity).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def hll_rollup_estimate(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge per-bucket sketches up to ``keys`` and estimate distinct
    count. Union is associative and commutative (order- and
    partitioning-insensitive) — the incremental-rollup property;
    exact in the sparse regime, within the sketch error bound of a
    single-pass sketch beyond it."""
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


# --- count-min sketch ---------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 64


def cms_bucket(col: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic cross-engine CMS hash: row ``row``'s bucket for a
    key value. md5 over ``"{row}:{value}"`` -> top 15 hex digits as a
    BIGINT (always < 2^63, so never negative) -> mod width. DuckDB
    twin: ``CAST(concat('0x', substr(md5(j || ':' || CAST(k AS
    VARCHAR)), 1, 15)) AS BIGINT) % width`` — bit-identical, which is
    what lets a sketch ESTIMATE be oracle-checked at all."""
    s = F.concat(F.lit(f"{row}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % width


def cms_counters(
    df: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of ``key``'s frequency distribution: a
    ``depth x width`` counter matrix as a DataFrame ``(j, bucket, c)``.

    The counter matrix is the mergeable artifact HLL cannot provide
    for FREQUENCY (HLL answers distinct-count): counters from disjoint
    slices add element-wise, so a pipeline materializes one tiny
    (depth*width rows, O(1) in corpus size) matrix per partition/day
    and any horizon's sketch is a SUM over pre-built matrices — same
    incremental-rollup shape as hll_partial_sketches. Built with one
    posexplode (depth rows per input) into a map-side-partialed hash
    aggregate; the shuffle carries at most depth*width rows per task,
    never key values."""
    buckets = F.array(*[cms_bucket(F.col(key), j, width) for j in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    counters: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each candidate key: estimate =
    min over rows j of counter[j][h_j(key)] — the classic CMS read,
    always >= the true count (counters only ever over-count on
    collision). The counter matrix is broadcast (depth*width rows);
    per-candidate work is a broadcast equi-join on (j, bucket) plus a
    MIN aggregate, so estimating any candidate set is one narrow pass
    over it."""
    buckets = F.array(*[cms_bucket(F.col(key), j, width) for j in range(depth)])
    other = [c for c in candidates.columns if c != key]
    expl = candidates.select(
        key, *other, F.posexplode(buckets).alias("j", "bucket")
    )
    # LEFT join + coalesce(0): a candidate whose (j, bucket) has no
    # counter row (estimating against another slice's sketch — the
    # documented mergeable use) must read that counter as 0, giving
    # the classic CMS min(..., 0) = 0 — an inner join would instead
    # drop the depth row and return a spurious positive estimate (or
    # lose the key entirely when all its buckets are empty).
    return (
        expl.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(key, *other)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est_n"))
    )

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

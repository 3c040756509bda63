"""Z-order (Morton-curve) data layout for multi-column file pruning.

Partitioning prunes on ONE directory key and sorting clusters on ONE
leading column; a scan filtered on a *different* column still reads
every file. Z-ordering interleaves the bits of several columns into one
sort key, so files cover small rectangles of the multi-dimensional key
space and parquet footer min/max stats prune on ANY of the z-ordered
columns — the layout trick behind Delta's OPTIMIZE ZORDER BY, here as a
plain write-time transform (no table format required).

Mechanics, all JVM-side expressions:

1. each dimension is min-max scaled to a ``bits``-wide integer
   (2 scalars per column collected once on the driver — bounded work),
2. the scaled values' bits are interleaved into one long (for k
   columns only the top ``63 // k`` bits per column fit — plenty: file
   pruning needs coarse locality, not exact ordering),
3. rows are range-partitioned then sorted within partitions by the
   z-value, so each output file owns a compact z-range.

At 100 TB this runs as a periodic compaction job over cold partitions;
the write is one range-exchange + local sort, and every later scan on
any z-ordered column skips the files whose min/max rectangle misses the
predicate.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "_zvalue"


def _scaled(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Min-max scale to [0, 2^bits): a pure expression once the two
    boundary scalars are known."""
    top = (1 << bits) - 1
    if mx <= mn:  # constant column: every row maps to bucket 0
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * top).cast("long")


def zorder_value(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """Morton interleave of ``cols`` (numeric / timestamp-castable)
    into one long column expression."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    k = len(cols)
    bits = bits or min(16, 63 // k)
    if bits * k > 63:
        raise ValueError(f"{bits} bits x {k} cols overflows a long")
    # one small driver-side agg for the per-column min/max boundaries
    aggs = []
    for c in cols:
        cd = F.col(c).cast("double")
        aggs += [F.min(cd).alias(f"_mn_{c}"), F.max(cd).alias(f"_mx_{c}")]
    row = df.agg(*aggs).first()
    parts: list[Column] = []
    for ci, c in enumerate(cols):
        s = _scaled(F.col(c), row[f"_mn_{c}"], row[f"_mx_{c}"], bits)
        for bi in range(bits):
            # bit bi of column ci lands at interleaved position bi*k+ci
            parts.append(
                F.shiftleft(F.shiftright(s, bi).bitwiseAND(F.lit(1)), bi * k + ci)
            )
    return functools.reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 8,
    bits: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of
    ``zorder_by``: range-partition by z-value (one exchange), sort
    within partitions, drop the helper column. Each output file then
    covers a compact rectangle in every z-ordered dimension."""
    z = zorder_value(df, zorder_by, bits)
    (
        df.withColumn(Z_COL, z)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )

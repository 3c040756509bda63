"""Scale-safe global ordered statistics (rank / NTILE / prefix sums).

An unpartitioned window (``Window.orderBy`` with no ``partitionBy``)
funnels its whole input through ONE task — Spark plans it as
``Exchange SinglePartition`` + a single sort. Fine over a provably
bounded frame; a scale killer when the input is a per-user/per-doc
dimension that itself grows with the data (billions of rows at 100 TB).

This module provides the exact same semantics with no global window,
generalizing the two-pass partition-offset plan from
``plans/relational.py::line_numbering``:

1. range-partition on the total order (one shuffle of the slim frame),
   sort within partitions, and PIN the partitioning with an eager
   ``localCheckpoint`` — re-executing ``repartitionByRange`` re-samples
   its boundaries (seeded from the RDD id), so both passes must read
   one materialized layout;
2. per-partition counts (and sums) aggregate map-side to ONE row per
   partition — the driver collect is bounded by the partition count,
   never the row count — and prefix-accumulate into per-partition
   offsets;
3. the global statistic is then a NARROW per-row computation: rank =
   offset[pid] + local index (``monotonically_increasing_id``
   arithmetic, pure JVM), running sums = sum-offset[pid] + the
   within-partition cumulative (a zero-shuffle Arrow pass — batches of
   one partition arrive in order, so a carried accumulator is exact).

NTILE(t) is a pure function of (rank, total): with n = t*q + rem, the
first ``rem`` tiles hold q+1 rows — identical to the SQL window
function, so DuckDB oracles keep their plain NTILE formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOCAL_IDX_BITS = 33  # monotonically_increasing_id: pid << 33 | local index


def ranged_frame(
    df: DataFrame, order_exprs: list[Column], n_parts: int | None = None
) -> DataFrame:
    """One range shuffle on the total order, sorted within partitions,
    materialized so every downstream pass reads the SAME partitioning.

    Reliability note: ``localCheckpoint`` blocks live only on executors
    — losing an executor mid-query makes the pinned RDD unrecoverable
    and FAILS the job (it cannot silently recompute into a different
    partitioning, which is exactly the property the two-pass plan
    needs, but it costs retry-from-scratch on executor loss). For
    long-running production jobs on preemptible nodes, swap in a
    reliable ``df.checkpoint()`` against a durable checkpoint dir; the
    two passes only require that both read ONE materialized layout."""
    spark = df.sparkSession
    p = n_parts or max(int(spark.sparkContext.defaultParallelism), 1)
    # eager=False: every caller's NEXT statement is the
    # _prefix_offsets collect, a full pass that both materializes the
    # pinned layout and computes the per-partition counts — one job
    # instead of two per ranged pass (the bpetrain convention). The
    # pin itself is unchanged: after that first action the blocks are
    # fixed, so repartitionByRange's boundary re-sampling can never
    # split the two passes.
    return (
        df.repartitionByRange(p, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .localCheckpoint(eager=False)
    )


def _prefix_offsets(
    ranged: DataFrame, extra_aggs: list[Column] | None = None
) -> tuple[dict[int, int], int, list]:
    """Per-partition row counts -> (rank offsets, total rows, the raw
    per-partition agg rows for caller-side reductions like global max)."""
    aggs = [F.count(F.lit(1)).alias("_cnt"), *(extra_aggs or [])]
    rows = sorted(
        ranged.groupBy(F.spark_partition_id().alias("_pid")).agg(*aggs).collect(),
        key=lambda r: r["_pid"],
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in rows:  # range partitions are ordered by the sort key
        offsets[row["_pid"]] = acc
        acc += row["_cnt"]
    return offsets, acc, rows


def _offset_map(offsets: dict[int, int]) -> Column:
    return F.create_map(
        *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
    )


def global_row_number(
    df: DataFrame,
    order_exprs: list[Column],
    rn_col: str = "rn",
    extra_aggs: list[Column] | None = None,
) -> tuple[DataFrame, int, list]:
    """1-based ROW_NUMBER() OVER (ORDER BY <order_exprs>) with no
    window: returns (frame + rn_col, total row count, per-partition agg
    rows for ``extra_aggs``). Narrow numbering — the only data movement
    is the one range shuffle inside ``ranged_frame``."""
    ranged = ranged_frame(df, order_exprs)
    offsets, total, rows = _prefix_offsets(ranged, extra_aggs)
    mid = F.monotonically_increasing_id()
    local_idx = mid.bitwiseAND(F.lit((1 << _LOCAL_IDX_BITS) - 1))
    pid = F.shiftright(mid, _LOCAL_IDX_BITS).cast("int")
    out = ranged.withColumn(
        rn_col,
        (F.element_at(_offset_map(offsets), pid) + local_idx + 1).cast("long"),
    )
    return out, total, rows


def ntile_from_rank(rn: Column, n_tiles: int, total: int) -> Column:
    """Exact SQL NTILE(t) as a pure function of (rank, total): n = t*q
    + rem; the first rem tiles hold q+1 rows, the rest q."""
    q, rem = divmod(int(total), int(n_tiles))
    cut = rem * (q + 1)
    first = ((rn - 1) - ((rn - 1) % (q + 1))) / (q + 1)  # integer-exact
    rest = F.lit(rem) + ((rn - cut - 1) - ((rn - cut - 1) % max(q, 1))) / max(q, 1)
    tile = F.when(rn <= cut, first).otherwise(rest) if cut else rest
    return (tile + 1).cast("int")


def global_ntile(
    df: DataFrame,
    order_exprs: list[Column],
    n_tiles: int,
    out_col: str,
    extra_aggs: list[Column] | None = None,
) -> tuple[DataFrame, list]:
    """NTILE(n_tiles) OVER (ORDER BY <order_exprs>) without the global
    window. Returns (frame + tile column, per-partition agg rows)."""
    rn = f"_rn_{out_col}"
    numbered, total, rows = global_row_number(df, order_exprs, rn, extra_aggs)
    out = numbered.withColumn(out_col, ntile_from_rank(F.col(rn), n_tiles, total)).drop(rn)
    return out, rows


def global_rank_cumsum(
    df: DataFrame,
    order_exprs: list[Column],
    sum_col: str,
    rank_col: str = "rank",
    cum_col: str = "cum",
) -> tuple[DataFrame, int]:
    """ROW_NUMBER + running SUM(sum_col) over a global total order with
    no window and no second shuffle: per-partition sums prefix into
    offsets, then one zero-shuffle Arrow pass carries the accumulator
    through each partition's batches (they arrive in order). Returns
    (frame + rank + cum, grand total). ``sum_col`` must be integral —
    int64 cumsum is exact regardless of accumulation grouping, so the
    result is bit-identical to the serial SQL window. NULLs in
    ``sum_col`` count as 0 in BOTH passes (the offsets aggregate sums
    NULL-skipping like SQL; the Arrow kernel fills nulls with 0 before
    the int64 cast — a null-bearing int column otherwise arrives as
    float64 with NaN, whose int64 cast is undefined)."""
    import numpy as np
    import pyarrow as pa

    sum_t = dict(df.dtypes)[sum_col]
    if sum_t not in ("int", "bigint", "smallint", "tinyint", "long"):
        raise ValueError(f"global_rank_cumsum needs an integral sum_col, got {sum_t}")

    ranged = ranged_frame(df, order_exprs)
    offsets, _, rows = _prefix_offsets(ranged, [F.sum(sum_col).alias("_s")])
    cum_off: dict[int, int] = {}
    acc = 0
    for row in rows:
        cum_off[row["_pid"]] = acc
        acc += int(row["_s"] or 0)
    total = acc

    src = ranged.withColumn("_pid", F.spark_partition_id())
    in_cols = ranged.columns
    ddl = ", ".join(f"{c} {t}" for c, t in ranged.dtypes)
    ddl += f", {rank_col} long, {cum_col} long"
    sum_idx = in_cols.index(sum_col)
    pid_idx = len(in_cols)
    rank_offsets = offsets

    def op(batches):
        r_base = c_base = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if r_base is None:  # one partition per op() invocation
                pid = b.column(pid_idx)[0].as_py()
                r_base, c_base = rank_offsets[pid], cum_off[pid]
            s_col = b.column(sum_idx)
            if s_col.null_count:  # NULL counts as 0, matching the offsets pass
                s_col = s_col.fill_null(0)
            vals = s_col.to_numpy(zero_copy_only=False).astype(np.int64)
            cums = np.cumsum(vals) + c_base
            ranks = np.arange(1, len(vals) + 1, dtype=np.int64) + r_base
            c_base = int(cums[-1])
            r_base += len(vals)
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(len(in_cols))]
                + [pa.array(ranks, type=pa.int64()), pa.array(cums, type=pa.int64())],
                names=in_cols + [rank_col, cum_col],
            )

    return src.mapInArrow(op, ddl), total

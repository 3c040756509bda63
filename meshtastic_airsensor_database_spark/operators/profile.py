"""One-pass table profiling — the data-quality summary a pipeline runs
before trusting a new snapshot (null rates, cardinalities, numeric
ranges per column).

Scale shape: ALL columns profile in ONE aggregation over ONE scan —
null counts and min/max are plain partialed aggregates; the exact
distinct counts compile to Spark's Expand operator (one input row per
distinct-column), which is the documented cost of exactness in a
single pass. For wide tables at extreme scale the drop-in relaxation
is ``approx=True`` (HLL-based ``approx_count_distinct``: no Expand,
pure partial aggs — same plan shape as the sketch rollup family). The
single ~4xN-column result row is driver-sized; the unpivot to one row
per column is a narrow ``stack``.

Reference parity: the reference eyeballs its CSVs in pandas
(cleandata.py); this is the principled replacement and plain extension
surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _num_expr(field: T.StructField):
    """Numeric view of a column for range stats: numerics cast to
    double, timestamps to epoch seconds, everything else absent."""
    c = F.col(field.name)
    if isinstance(field.dataType, _NUMERIC):
        return c.cast("double")
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_timestamp(c).cast("double")
    return None


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """Profile every top-level column: (column, n_rows, n_null,
    n_distinct, min_num, max_num) — one scan, one aggregate."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    per_col: list[str] = []
    for field in df.schema.fields:
        name = field.name
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).cast("long").alias(f"__null_{name}"))
        distinct = (
            F.approx_count_distinct(name) if approx else F.countDistinct(name)
        )
        aggs.append(distinct.cast("long").alias(f"__dist_{name}"))
        num = _num_expr(field)
        aggs.append(
            (F.min(num) if num is not None else F.lit(None).cast("double")).alias(
                f"__min_{name}"
            )
        )
        aggs.append(
            (F.max(num) if num is not None else F.lit(None).cast("double")).alias(
                f"__max_{name}"
            )
        )
        per_col.append(name)
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __null_{name}, __dist_{name}, __min_{name}, __max_{name}"
        for name in per_col
    )
    return row.select(
        F.expr(
            f"stack({len(per_col)}, {stack_args}) as "
            "(column, n_null, n_distinct, min_num, max_num)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_num", "max_num")


def table_content_checksum(df: DataFrame, name: str, cols: Sequence[str]) -> DataFrame:
    """Order-insensitive content checksum of ``cols``: row count + the
    bit_xor of an md5-derived 63-bit integer over a canonical
    '|'-joined string rendering of each row. Two replicas match iff
    (n_rows, checksum) match — no sort, no row transfer; xor partials
    combine across partitions, so the exchange carries one row.

    The md5->15-hex-digit->BIGINT construction is the cross-engine
    deterministic hash (same as operators/sketch.py::cms_bucket), which
    is what lets the checksum itself be oracle-checked. Restrict cols
    to integer/varchar: decimal/timestamp TEXT rendering is not
    contractual across engines.

    Canonical form: each column renders as chr(2) + value, or chr(1)
    alone for NULL, joined by the chr(31) unit separator — NULL is
    distinguishable from empty string and from absence, and column
    boundaries are unambiguous for any value not containing chr(31)
    (control characters in checksummed text columns are the one
    documented restriction). A plain '|'-join would skip NULLs
    entirely (Spark concat_ws) or NULL the whole row (SQL ||), and
    ('a|b','c') would collide with ('a','b|c')."""
    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                F.concat(F.lit("\x02"), F.col(c).cast("string")), F.lit("\x01")
            )
            for c in cols
        ],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("h").alias("checksum"),
        )
        .select(F.lit(name).alias("table_name"), "n_rows", "checksum")
    )

"""Vector math over array<float|double> columns (SURVEY.md §2.11).

Dot product / norms / cosine via ``zip_with`` + ``aggregate`` — JVM
built-ins, no UDF, so embedding similarity scans stay in whole-stage
codegen. Inputs are cast to double so results are bit-stable against a
DuckDB double oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product (parity with a SQL list_dot_product)."""
    prods = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (|a||b|); zero-norm input -> null (not NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)

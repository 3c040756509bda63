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


def quantize_int8(col: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: ``q[i] = round_half_up(
    v[i] / scale)`` with ``scale = max|v| / 127`` — the
    memory-bandwidth lever for 100-TB similarity scans (4x smaller
    vectors than float32, 8x than float64; SIMD int8 dot products on
    real hardware).

    Returns ``array<int>`` with every element in [-127, 127]; the
    all-zero vector quantizes to all zeros. Cosine needs NO
    dequantization: the per-vector scale multiplies every element, so
    it cancels in ``cos(a,b) = a.b / (|a||b|)`` — compute cosine
    directly on the int arrays. Rounding is floor(x + 0.5) (half toward
    +inf), chosen because both Spark and DuckDB evaluate it identically
    on doubles (plain round() is HALF_UP on decimal strings in Spark
    but banker's/C-rounding elsewhere).
    """
    v = _as_double_array(col)
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    zeros = F.transform(v, lambda x: F.lit(0))
    return F.when(maxabs > 0, q).otherwise(zeros)


def int8_scale(col: Column | str) -> Column:
    """The dequantization scale paired with ``quantize_int8`` (needed
    only for magnitude-sensitive consumers — dot products, L2 — not
    for cosine)."""
    v = _as_double_array(col)
    return F.array_max(F.transform(v, F.abs)) / F.lit(127.0)


def cosine_similarity_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow/BLAS row-wise cosine — the bulk-verify twin of
    ``cosine_similarity`` for stages that score MILLIONS of candidate
    pairs (LSH/cluster verify joins), where the higher-order-function
    formulation evaluates interpreted per element (measured 159 s for
    5M 64-dim pairs vs ~2 s vectorized).

    Semantics match the expression path at filter level: a zero-norm
    side yields NaN (the expression path yields NULL) — both fail any
    ``>= threshold`` predicate, which is the only way verify stages
    consume the value. Raw doubles differ from the sequential
    reduction only in the last ulp (einsum pairwise summation);
    callers round through the decimal route before comparison like
    every other scored column.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _rowcos(va, vb):
        A = np.stack([np.asarray(x, dtype=np.float64) for x in va])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in vb])
        num = np.einsum("ij,ij->i", A, B)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(np.where(denom > 0, num / denom, np.nan))

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _rowcos(ca, cb)


def dot_raw(a: Column, b: Column) -> Column:
    """Sequential dot product over PRE-CAST double-array expressions.

    The hoisted-capture variant of ``dot``: both arguments must already
    be array<double> (a materialized column, a lambda variable, or a
    pack field) — no cast is applied, so capturing the result inside a
    HOF lambda re-evaluates nothing but the bare references
    (functions/text.py::zipped_ngrams documents the trap this exists
    to avoid)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dist2_raw(a: Column, b: Column) -> Column:
    """Sequential squared-L2 over PRE-CAST double-array expressions
    (same no-cast contract as ``dot_raw``; DuckDB twin:
    ``list_sum(list_transform(range(...), i -> (a[i]-b[i])^2))``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

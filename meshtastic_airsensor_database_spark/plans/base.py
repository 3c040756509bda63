"""Shared plumbing for declared queries.

Parity conventions (driver hash-compares Spark vs DuckDB at sf0.01):
- every computed double is ``round(x, N)`` with the same N on both
  sides (parallel double summation differs in the last ulp; rounding
  makes the hash stable);
- integer sums / row_number are cast to BIGINT on both sides (DuckDB
  widens integer SUM to HUGEINT, Spark to LONG);
- column names are aliased identically on both sides;
- ORDER BY never matters (driver hash is order-insensitive) but LIMIT
  queries always order by a unique tie-break key so both engines pick
  the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


def r(col, n: int = 2):
    """Parity-safe double rounding.

    Naive ROUND on doubles diverges between engines at shortest-repr
    ``.xx5`` boundaries (Java rounds the decimal string HALF_UP; C
    rounds the binary value). Routing through DECIMAL(38,9) first
    collapses cross-engine ulp noise to the same 9-decimal value, and
    decimal->2 rounding is exact half-away-from-zero in both engines.
    SQL twin: ``CAST(ROUND(CAST(x AS DECIMAL(38,9)), n) AS DOUBLE)``.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(38,9)"), n).cast("double")


@dataclass(frozen=True)
class Query:
    """One declared query: Spark builder + optional DuckDB oracle SQL."""

    name: str
    builder: Builder
    oracle: str | None
    survey_ids: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""

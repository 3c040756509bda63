"""Assemble the declared query surface from the plan modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import curateq, events, relational, streamq, textq, tsq, vectorq
from .base import Query

REGISTRY: dict[str, Query] = {}
for _mod in (relational, events, textq, vectorq, streamq, curateq, tsq):
    for _q in _mod.QUERIES:
        if _q.name in REGISTRY:
            raise ValueError(f"duplicate query name {_q.name!r}")
        REGISTRY[_q.name] = _q

# The driver walks queries() in dict order under a global time budget —
# run the most expensive queries LAST so a budget overrun only ever
# drops them, never the cheap green rows behind them (the r01 run died
# midway through this module's namespace for exactly that reason).
_RUN_LAST = [
    "neardup_components",
    "minhash_verified_neardups",
    "ml_minhash_neardups",
    "embedding_neardup_pairs",
    "jaccard_neardup_pairs",
    "char_jaccard_neardup_pairs",
]
REGISTRY = {
    **{n: q for n, q in REGISTRY.items() if n not in _RUN_LAST},
    **{n: REGISTRY[n] for n in _RUN_LAST if n in REGISTRY},
}


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

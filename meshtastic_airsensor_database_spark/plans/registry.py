"""Assemble the declared query surface from the plan modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import events, relational, textq, vectorq
from .base import Query

REGISTRY: dict[str, Query] = {}
for _mod in (relational, events, textq, vectorq):
    for _q in _mod.QUERIES:
        if _q.name in REGISTRY:
            raise ValueError(f"duplicate query name {_q.name!r}")
        REGISTRY[_q.name] = _q


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

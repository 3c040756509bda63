"""Snapshot reconciliation: keyed diff of two table versions.

The operational question every batch pipeline answers after a rerun —
"what changed between yesterday's output and today's?" — as one full
outer join: rows only in the new snapshot are ``added``, only in the
old are ``removed``, present in both with any compared column
differing are ``changed``, else ``unchanged``.

Scale shape: ONE full outer equi-join on the key (shuffle both sides
on the key, AQE handles skew); the change predicate is a null-safe
column comparison evaluated in codegen post-join — no hashing round
trip, no second pass. Comparing column-wise (rather than a row hash)
keeps the diff oracle-checkable and lets callers project the old/new
values straight out of the result for audit.

Reference parity: none (the reference is INSERT-only and never
reconciles); this is the engine-side generalization of its
"idempotent DDL + append" posture to updatable outputs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff -> (keys..., status, old_<c>..., new_<c>...).

    ``status`` is one of added / removed / changed / unchanged.
    ``compare_cols`` defaults to every non-key column of ``new``
    (which must exist in ``old`` too). Column comparison is null-safe:
    NULL -> value and value -> NULL both count as changed.
    """
    compare = (
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    missing = [c for c in compare if c not in old.columns]
    if missing:
        raise ValueError(f"compare columns absent from old snapshot: {missing}")

    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    ).alias("o")
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    ).alias("n")
    joined = o.join(n, keys, "full_outer")
    any_changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare
        ],
        F.lit(False),
    )
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(any_changed, "changed")
        .otherwise("unchanged")
    )
    return joined.select(
        *keys,
        status.alias("status"),
        *[f"old_{c}" for c in compare],
        *[f"new_{c}" for c in compare],
    )

"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Together with the alternating-star connected components in
operators/dedup.py this covers the two graph shapes a curation pipeline
runs over its similarity graph: CC answers "which docs are the same
cluster", PageRank answers "which doc is the most CENTRAL member" — a
principled canonical-representative choice (most-connected near-dup)
instead of min-id, and the same power-iteration skeleton as link-based
quality scoring over a web crawl graph.

Scale shape per iteration (the Pregel-on-DataFrames pattern):
one equi-join of the edge list against the current rank vector on the
source key, then one hash aggregate on the destination key — both
map-side-partialed shuffles on node ids; the edge list is never
collected or replicated. Ranks are a (node, double) table, ~node-count
rows. For long runs ``checkpoint_every`` truncates lineage the same way
connected_components does (localCheckpoint, or a reliable checkpoint
dir when configured); the default 3-iteration analytical use needs
none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERATIONS = 3


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over the UNDIRECTED graph induced by
    ``edges`` (each input pair contributes both directions; duplicate
    edges are collapsed). Returns ``(node, deg, pagerank)``.

    Fixed iteration count (not convergence detection) keeps the result
    a pure deterministic function of the edge list — which is what lets
    a SQL oracle reproduce it by unrolling the same ``n_iter`` steps.
    Every node in a pair graph has degree >= 1, so there is no dangling
    mass to redistribute.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1 (got {n_iter})")
    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).distinct()
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # node count: one scalar to the driver (the teleport term needs it;
    # same bounded pattern as connected_components' convergence probe)
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("s").alias("node"), "deg", F.lit(0.0).alias("pagerank")
        )
    base = (1.0 - damping) / n
    # out-contribution is rank/degree; pre-joining degree once keeps the
    # per-iteration work to one join + one agg
    und_deg = und.join(deg, "s")
    pr = deg.select(F.col("s").alias("node"), F.lit(1.0 / n).alias("pr"))
    for i in range(n_iter):
        contrib = und_deg.join(
            pr.withColumnRenamed("node", "s"), "s"
        ).select(F.col("d").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
        pr = contrib.groupBy("node").agg(
            (F.lit(base) + F.lit(damping) * F.sum("c")).alias("pr")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return (
        pr.join(deg.withColumnRenamed("s", "node"), "node")
        .select("node", "deg", F.col("pr").alias("pagerank"))
    )

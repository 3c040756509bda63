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


# --- co-occurrence graph construction -----------------------------------------

COOC_MAX_BUCKET = 500


def cooccurrence_edges(
    df: DataFrame,
    entity: str,
    bucket,
    min_shared: int,
    max_bucket: int = COOC_MAX_BUCKET,
) -> DataFrame:
    """Build the co-occurrence graph: entities are connected when they
    appear in at least ``min_shared`` common buckets (users sharing
    active hours, terms sharing documents, items sharing baskets).

    Scale shape: distinct (entity, bucket) via hash agg, a bucket-size
    gate dropping degenerate hub buckets (> ``max_bucket`` members —
    a bucket everyone is in carries no signal but generates B^2 pairs;
    the LSH MAX_BUCKET pattern), then a SELF EQUI-JOIN on the bucket
    key with entity_a < entity_b, and one more hash agg counting shared
    buckets per pair. Both shuffles are on bounded-width keys; pair
    fan-out per bucket is capped at max_bucket^2.

    The kept stream is RANGE-partitioned by the bucket key before the
    pair join: co-occurrence buckets are usually ordered (clock hours,
    document positions) and ADJACENT buckets share most of their
    members, so clustering a task's buckets by range makes the same
    (src, dst) pair recur WITHIN the task and the pair aggregate's
    map-side partial collapses it before the exchange — where hash
    partitioning scatters adjacent buckets across all tasks and every
    recurrence ships separately. Measured on the co-presence graph at
    sf0.1: edge materialization 4.54 -> 2.83 s, identical edges (r11
    verdict next-round #6; partition count comes from
    spark.sql.shuffle.partitions — scale-adaptive, not a local
    constant).
    """
    eb = df.select(
        F.col(entity).alias("_e"), bucket.alias("_b")
    ).distinct()
    sizes = eb.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # explicit partition count (REPARTITION_BY_NUM): the count-less
    # form is AQE-coalescible, and AQE sizes it by the TINY pre-join
    # input — measured collapsing to one partition and serializing the
    # whole pair fan-out (4.2 s vs 1.7 s). The value still comes from
    # the session's shuffle-partitions conf, not a local constant.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    kept = eb.join(
        F.broadcast(sizes.where(F.col("_n") > max_bucket).select("_b")),
        "_b",
        "left_anti",
    ).repartitionByRange(n_parts, "_b")
    a = kept.select(F.col("_e").alias("src"), "_b")
    b = kept.select(F.col("_e").alias("dst"), "_b")
    return (
        a.join(b, "_b")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


# --- triangle counting --------------------------------------------------------


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts via the degree-ordered
    orientation (Cohen's MapReduce triangle algorithm / compact-forward):
    orient every undirected edge from its lower (degree, id) endpoint
    to the higher, enumerate wedges at each node's out-neighborhood,
    and close them against the oriented edge set.

    Why this survives scale: out-degree under the degree ordering is
    bounded by O(sqrt(m)) (graph arboricity), so the wedge fan-out is
    sum deg_out^2 = O(m^1.5) worst case instead of sum deg^2, which a
    star node makes quadratic in the naive formulation. Both the wedge
    step and the closing step are plain equi-joins (shuffle on node
    id / id pair); the triangle set is orientation-independent, so the
    oracle can verify with the simpler id-ordering.

    The canonical edge list is MATERIALIZED once (checkpoint when a
    checkpoint dir is configured, localCheckpoint otherwise — the
    connected_components convention): the degree branch, the
    orientation join and all three triangle-join sides consume it, and
    without truncation Spark re-executes the whole upstream edge
    construction per consumer (measured 5.1 s -> 1.4 s at sf0.1 for
    the co-presence graph, whose edge build is itself a join).
    """
    e = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sc = e.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        e = e.checkpoint(eager=True)
    else:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("osrc"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("odst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("odeg"),
    )
    x, y, z = oriented.alias("x"), oriented.alias("y"), oriented.alias("z")
    wedge_order = (F.col("x.odeg") < F.col("y.odeg")) | (
        (F.col("x.odeg") == F.col("y.odeg")) & (F.col("x.odst") < F.col("y.odst"))
    )
    tri = (
        x.join(y, F.col("x.osrc") == F.col("y.osrc"))
        .where(wedge_order)
        .join(
            z,
            (F.col("z.osrc") == F.col("x.odst"))
            & (F.col("z.odst") == F.col("y.odst")),
        )
        .select(
            F.col("x.osrc").alias("u"),
            F.col("x.odst").alias("v"),
            F.col("y.odst").alias("w"),
        )
    )
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )

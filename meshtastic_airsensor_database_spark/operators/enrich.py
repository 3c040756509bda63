"""Dimension enrichment (SURVEY.md §2.3).

The reference enriches every fact with (topic_id, longname) via a
Python dict lookup with a (None, None) default — i.e. a LEFT OUTER
broadcast hash join (AIRWISEv0.py:122, dict seeded at :41-49) — and
upserts the dict from nodeinfo packets, latest packet wins
(AIRWISEv0.py:253-254).

Scale note: the node dimension is tiny (6 rows in the reference; at
most millions of devices in any real mesh), so the join is ALWAYS
broadcast — no shuffle of the 100 TB fact side, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import NODE_DIM_SCHEMA, NODE_DIM_SEED


def seed_node_dim(spark: SparkSession) -> DataFrame:
    """The reference's static fleet seed (AIRWISEv0.py:41-49)."""
    rows = [(node, topic, name, None) for node, topic, name in NODE_DIM_SEED]
    return spark.createDataFrame(rows, NODE_DIM_SCHEMA)


def node_dim_enrich(facts: DataFrame, node_dim: DataFrame) -> DataFrame:
    """LEFT broadcast join facts -> (topic_id, longname); miss -> nulls.

    Mirrors ``node_dict.get(node, (None, None))`` (AIRWISEv0.py:122).
    Works identically on batch and streaming fact DataFrames
    (stream-static join).
    """
    dim = F.broadcast(node_dim.select("node", "topic_id", "longname"))
    return facts.join(dim, "node", "left")


def dim_upsert_latest_wins(node_dim: DataFrame, updates: DataFrame) -> DataFrame:
    """Merge nodeinfo updates into the dimension; latest update per node wins.

    Mirrors ``map_nodes``'s dict assignment (AIRWISEv0.py:253-254): a
    later nodeinfo packet overwrites, existing nodes absent from the
    batch are kept. Implemented as union + row_number latest-wins (the
    Delta-free MERGE emulation); in streaming this runs inside
    ``foreachBatch`` against the persisted dimension.
    """
    unioned = node_dim.select("node", "topic_id", "longname", "updated_ts").unionByName(
        updates.select("node", "topic_id", "longname", "updated_ts")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("updated_ts").desc_nulls_last(), F.col("topic_id").desc_nulls_last()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

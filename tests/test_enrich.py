"""Dimension enrich / upsert tests (SURVEY §2.3)."""

from __future__ import annotations

import datetime as dt

from meshtastic_airsensor_database_spark.operators.enrich import (
    dim_upsert_latest_wins,
    node_dim_enrich,
    seed_node_dim,
)


def test_enrich_left_semantics(spark):
    """Known node -> (topic_id, longname); unknown -> (None, None),
    mirroring node_dict.get(node, (None, None)) (AIRWISEv0.py:122)."""
    facts = spark.createDataFrame(
        [(3127201152, 1.0), (999, 2.0)], ["node", "temperature"]
    )
    out = {r.node: r for r in node_dim_enrich(facts, seed_node_dim(spark)).collect()}
    assert out[3127201152].longname == "Farm1"
    assert out[3127201152].topic_id == "!ba654d80"
    assert out[999].longname is None and out[999].topic_id is None
    assert len(out) == 2  # left join never drops facts


def test_upsert_latest_wins(spark):
    dim = seed_node_dim(spark)
    t1 = dt.datetime(2024, 1, 1, 10, 0)
    t2 = dt.datetime(2024, 1, 1, 11, 0)
    updates = spark.createDataFrame(
        [
            (3127201152, "!ba654d80", "Farm1-renamed", t1),
            (3127201152, "!ba654d80", "Farm1-final", t2),  # later wins
            (555, "!new", "NewNode", t1),  # insert
        ],
        ["node", "topic_id", "longname", "updated_ts"],
    )
    merged = {r.node: r for r in dim_upsert_latest_wins(dim, updates).collect()}
    assert merged[3127201152].longname == "Farm1-final"
    assert merged[555].longname == "NewNode"
    assert merged[2102560288].longname == "Farm2"  # untouched rows kept
    assert len(merged) == 7

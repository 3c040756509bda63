"""Persisted MinHash-LSH band index (operators/dedup_index.py):
build / extend / probe lifecycle for incremental corpus dedup —
new shards are checked against everything ingested so far by reading
the INDEX, never the corpus text, and without shuffling the index."""

from __future__ import annotations

import os

import pytest

from meshtastic_airsensor_database_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_new_batch,
    extend_minhash_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "meshtastic nodes report air quality telemetry every thirty seconds"),
    (3, "particulate matter rises sharply during wildfire season in the hills"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index_path(tmp_path):
    return os.path.join(str(tmp_path), "mh_index")


def test_build_probe_finds_cross_shard_duplicates(spark, index_path):
    build_minhash_index(_df(spark, CORPUS), index_path)
    batch = _df(
        spark,
        [
            # exact copy of indexed doc 1 -> est_jaccard 1.0, always
            (101, CORPUS[0][1]),
            # fresh content -> disjoint shingles, no candidate at all
            (102, "completely different words about database engines and shuffles"),
        ],
    )
    got = {
        (r.new_id, r.indexed_id): r.est_jaccard
        for r in dedup_new_batch(batch, index_path, threshold=0.5).collect()
    }
    assert got == {(101, 1): 1.0}


def test_extend_then_probe_catches_new_generation_dups(spark, index_path):
    build_minhash_index(_df(spark, CORPUS), index_path)
    survivors = _df(
        spark, [(201, "a brand new document that survives the first dedup pass fine")]
    )
    assert dedup_new_batch(survivors, index_path).count() == 0
    extend_minhash_index(survivors, index_path)
    # a later shard duplicating the EXTENDED survivor is caught too
    later = _df(
        spark, [(301, "a brand new document that survives the first dedup pass fine")]
    )
    got = {(r.new_id, r.indexed_id) for r in dedup_new_batch(later, index_path).collect()}
    assert got == {(301, 201)}
    # and the original corpus is still indexed (append did not clobber)
    again = _df(spark, [(302, CORPUS[1][1])])
    got2 = {(r.new_id, r.indexed_id) for r in dedup_new_batch(again, index_path).collect()}
    assert got2 == {(302, 2)}


def test_probe_plan_broadcasts_shard_never_shuffles_index(spark, index_path):
    """The 100-TB contract: both probe joins broadcast the SHARD side;
    the stored band/signature tables are scanned once each and never
    sort-merge-joined (which would shuffle the whole index per shard)."""
    build_minhash_index(_df(spark, CORPUS), index_path)
    batch = _df(spark, [(101, CORPUS[0][1])])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = (
        dedup_new_batch(batch, index_path)._jdf.queryExecution().explainString(mode)
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_estimator_tracks_partial_overlap(spark, index_path):
    """A near-copy (most shingles shared) must surface as a candidate
    with a high estimate; the estimate is the matching-minima fraction,
    so it is a multiple of 1/32."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    build_minhash_index(_df(spark, [(1, base)]), index_path)
    near = base.replace("mu", "nu")  # tail edit: most 3-gram shingles survive
    rows = dedup_new_batch(
        _df(spark, [(401, near)]), index_path, threshold=0.0
    ).collect()
    assert [(r.new_id, r.indexed_id) for r in rows] == [(401, 1)]
    est = rows[0].est_jaccard
    assert 0.5 <= est < 1.0 and abs(est * 32 - round(est * 32)) < 1e-9


def test_probe_drops_degenerate_index_buckets(spark, index_path):
    """The MAX_BUCKET guard, probe-side: a band key held by more than
    max_bucket indexed docs (boilerplate) is dropped whole before the
    candidate join — one degenerate key must not fan a probe out by
    the bucket's size."""
    boiler = "exactly the same boilerplate text repeated across the corpus"
    build_minhash_index(
        _df(spark, [(i, boiler) for i in range(5)]), index_path
    )
    batch = _df(spark, [(900, boiler)])
    # bucket size 5 > cap 4 -> dropped -> no candidates at all
    assert dedup_new_batch(batch, index_path, max_bucket=4).count() == 0
    # with the cap above the bucket size the duplicates are all found
    got = {
        (r.new_id, r.indexed_id)
        for r in dedup_new_batch(batch, index_path, max_bucket=5).collect()
    }
    assert got == {(900, i) for i in range(5)}

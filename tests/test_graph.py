"""PageRank operator (operators/graph.py): known-graph values, mass
conservation, symmetry, and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.graph import pagerank_fixed


def _pr(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = pagerank_fixed(edges, **kw).collect()
    return {r["node"]: (r["deg"], r["pagerank"]) for r in rows}


def test_star_graph_center_dominates_and_mass_conserved(spark):
    got = _pr(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    assert got[0][0] == 4 and all(got[i][0] == 1 for i in (1, 2, 3, 4))
    assert got[0][1] > got[1][1]
    assert got[1] == got[2] == got[3] == got[4]  # leaves symmetric
    # undirected graph, no dangling nodes: total rank mass stays 1.0
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-12


def test_path_graph_middle_beats_ends(spark):
    got = _pr(spark, [(1, 2), (2, 3)])
    assert got[2][1] > got[1][1]
    assert got[1] == got[3]


def test_duplicate_and_reversed_edges_collapse(spark):
    a = _pr(spark, [(1, 2), (2, 3)])
    b = _pr(spark, [(1, 2), (2, 1), (2, 3), (2, 3), (3, 2)])
    assert a == b


def test_disconnected_cliques_rank_by_size(spark):
    # K3 ∪ K2: within a clique all equal; the triangle members' rank
    # equals the pair members' (both are degree-regular so the uniform
    # vector is stationary: everyone holds 1/n)
    got = _pr(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]
    assert abs(got[1][1] - 1 / 5) < 1e-12 and abs(got[10][1] - 1 / 5) < 1e-12


def test_more_iterations_sharpen_the_star(spark):
    one = _pr(spark, [(0, 1), (0, 2), (0, 3)], n_iter=1)
    five = _pr(spark, [(0, 1), (0, 2), (0, 3)], n_iter=5, checkpoint_every=2)
    assert five[0][1] == pytest.approx(0.58166203125, abs=1e-9)  # hand-computed
    assert one[0][1] == pytest.approx(0.675, abs=1e-9)
    assert abs(five[0][1] - one[0][1]) > 1e-4  # iterating actually moves ranks


def test_rejects_zero_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixed(edges, n_iter=0)


def test_triangle_counts_known_graph(spark):
    from meshtastic_airsensor_database_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_dedups_and_ignores_orientation(spark):
    from meshtastic_airsensor_database_spark.operators.graph import triangle_counts

    # same triangle given with duplicates, reversed edges, and a self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_cooccurrence_edges_threshold_and_hub_cap(spark):
    from pyspark.sql import functions as F

    from meshtastic_airsensor_database_spark.operators.graph import cooccurrence_edges

    rows = [
        # users 1,2 share buckets 10,11; user 3 only bucket 10
        (1, 10), (1, 11), (2, 10), (2, 11), (3, 10),
        # hub bucket 99 holds everyone; with max_bucket=3 it must not
        # create any pair (4 members > cap), while bucket 10 (3 members)
        # survives
        (1, 99), (2, 99), (3, 99), (4, 99),
    ]
    df = spark.createDataFrame(rows, "u long, b long")
    got = cooccurrence_edges(
        df, "u", F.col("b"), min_shared=2, max_bucket=3
    ).collect()
    assert [(r["src"], r["dst"], r["shared"]) for r in got] == [(1, 2, 2)]
